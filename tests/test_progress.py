"""ProgressLine (the rich_progress_bar.yaml analog) rendering."""

import io

from mygenerativerecommenders_tpu.train.loggers import ProgressLine


def test_progress_line_renders_and_closes():
    buf = io.StringIO()
    p = ProgressLine(10, "epoch 3", enabled=True, stream=buf, min_interval=0.0)
    p.update(1, loss=1.2345, lr=1e-3)
    p.update(10, loss=0.9, lr=1e-3)
    p.close()
    out = buf.getvalue()
    assert "epoch 3" in out
    assert "10/10" in out
    assert "loss=0.9" in out
    assert "lr=0.001" in out
    assert out.endswith("\n")


def test_progress_line_disabled_writes_nothing():
    buf = io.StringIO()
    p = ProgressLine(10, "epoch 0", enabled=False, stream=buf)
    p.update(5, loss=1.0)
    p.close()
    assert buf.getvalue() == ""


def test_progress_line_defaults_off_for_non_tty():
    buf = io.StringIO()  # no isatty -> False
    p = ProgressLine(4, "x", enabled=None, stream=buf)
    assert p.enabled is False
