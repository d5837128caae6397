"""CLI surface: the reference's -C/-L/-M/-a/-v/-V flags (qc_shor.c:1173-1264)
with validation actually enforced."""

import pytest

from quantumcomputer_tpu.cli import build_parser, main, validate


def test_mandatory_flags():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["-C", "15"])  # missing -L, -M
    args = p.parse_args(["-C", "15", "-L", "3", "-M", "4"])
    assert (args.C, args.L, args.M, args.a) == (15, 3, 4, 0)


def test_verbosity_flags():
    p = build_parser()
    args = p.parse_args(["-C", "15", "-L", "3", "-M", "4", "-V"])
    assert args.very_verbose and not args.verbose
    args = p.parse_args(["-C", "15", "-L", "3", "-M", "4", "-v"])
    assert args.verbose


def test_validation_rejects_bad_values():
    p = build_parser()
    # The reference's C<=0 check is broken (tests a pointer, qc_shor.c:1240)
    # and its L/M<=0 checks don't return (qc_shor.c:1245-1253); ours reject.
    assert validate(p.parse_args(["-C", "0", "-L", "3", "-M", "4"])) is not None
    assert validate(p.parse_args(["-C", "15", "-L", "0", "-M", "4"])) is not None
    assert validate(p.parse_args(["-C", "15", "-L", "3", "-M", "-1"])) is not None
    assert validate(p.parse_args(["-C", "15", "-L", "3", "-M", "4", "-a", "1"])) is not None
    assert validate(p.parse_args(["-C", "15", "-L", "30", "-M", "4"])) is not None
    assert validate(p.parse_args(["-C", "15", "-L", "3", "-M", "4", "-a", "7"])) is None


def test_main_end_to_end(capsys):
    rc = main(["-C", "15", "-L", "3", "-M", "4", "-a", "7", "--seed", "0", "-v"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Factors of 15 found: (5, 3)." in out
    assert "*WARNING*" in out  # L=3 < recommended for C=15


def test_main_bad_args(capsys):
    rc = main(["-C", "0", "-L", "3", "-M", "4"])
    assert rc == 2


def test_layout_flag(capsys):
    rc = main(["-C", "15", "-L", "3", "-M", "4", "-a", "7", "--seed", "0", "--layout", "m_high"])
    assert rc == 0
    assert "Factors of 15 found: (5, 3)." in capsys.readouterr().out


def test_layout_mesh_conflict():
    p = build_parser()
    args = p.parse_args(["-C", "15", "-L", "3", "-M", "4", "--layout", "m_high", "--devices", "2"])
    assert validate(args) is not None
