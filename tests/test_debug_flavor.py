"""VCFC_DEBUG: the reference's main_debug build flavor as an env flag
(utils/debug.py) — per-line codec tracing on STDERR, byte contract and
stdout purity intact."""

import numpy as np


def _capture(monkeypatch, capfd, fn):
    monkeypatch.setenv("VCFC_DEBUG", "1")
    out = fn()
    err = capfd.readouterr().err
    monkeypatch.delenv("VCFC_DEBUG")
    return out, err


def test_encode_traces_and_bytes_identical(monkeypatch, capfd):
    from vcfc_tpu.format.lines import encode_data_line

    line = b"1\t100\t.\tA\tT\t50\tPASS\t.\tGT\t0|0\t0|0\t0|1\t2|0\t1|1"
    quiet = encode_data_line(line)
    got, err = _capture(monkeypatch, capfd, lambda: encode_data_line(line))
    assert got == quiet  # tracing never changes the bytes
    assert "reference_name = 1, pos = 100\n" in err
    assert "0|0 occurred 2 times\n" in err
    assert "0|1 occurred 1 times\n" in err
    assert "Updating required length to" in err


def test_decode_traces(monkeypatch, capfd):
    from vcfc_tpu.format.lines import decode_data_line, encode_data_line

    enc = encode_data_line(b"1\t100\t.\tA\tT\t50\tPASS\t.\tGT\t0|0\t0|1")
    _, err = _capture(
        monkeypatch, capfd, lambda: decode_data_line(enc, 0, 2)
    )
    assert "expecting 2 samples" in err
    assert "Finished reading samples\n" in err


def test_disabled_is_silent(capfd):
    from vcfc_tpu.format.lines import decode_data_line, encode_data_line

    enc = encode_data_line(b"1\t100\t.\tA\tT\t50\tPASS\t.\tGT\t0|0\t0|1")
    decode_data_line(enc, 0, 2)
    captured = capfd.readouterr()
    assert captured.err == "" and captured.out == ""


def test_stdout_stays_pure_under_debug(monkeypatch, capfd):
    """The reference's debug build wrote debugf to STDOUT, corrupting
    the compressed stream (SURVEY §2) — ours must never touch stdout."""
    from vcfc_tpu.format.lines import encode_data_line

    monkeypatch.setenv("VCFC_DEBUG", "1")
    encode_data_line(b"1\t100\t.\tA\tT\t50\tPASS\t.\tGT\t0|0")
    captured = capfd.readouterr()
    assert captured.out == ""
    assert captured.err != ""
