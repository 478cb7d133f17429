"""Warmup CLI: compiles the configured resolutions into the cache."""

from botsort_tpu.cli import warmup


def test_warmup_mini(capsys):
    rc = warmup.main(["--mini", "--resolutions", "120x160"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "compiled 120x160" in out
