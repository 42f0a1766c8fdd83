"""TUI state machine, settings round trip, themes, api parsing
(cf. the reference's app.rs:930-1306, settings.rs:518-592, theme.rs tests)."""

import pytest

from rust_local_rag_tpu.tui.api import JobStatus, Stats, TuiSearchResult
from rust_local_rag_tpu.tui.app import AppState, Mode, Msg
from rust_local_rag_tpu.tui.settings import SETTING_KEYS, Settings, validate
from rust_local_rag_tpu.tui.theme import THEMES, get_theme, next_theme


def _results(n):
    return [
        TuiSearchResult(
            text=f"text {i}", score=0.9 - i * 0.1, document=f"d{i}.pdf",
            chunk_id=f"c{i}", chunk_index=i, page_number=i + 1,
        )
        for i in range(n)
    ]


# ----- state machine -----

def test_typing_updates_query():
    s = AppState()
    for ch in "hello":
        s.update(Msg("char", ch))
    assert s.query == "hello"
    assert s.cursor == 5
    s.update(Msg("backspace"))
    assert s.query == "hell"


def test_stale_search_id_guard():
    """app.rs:448-455: results for an old search are dropped."""
    s = AppState()
    sid1 = s.start_search()
    sid2 = s.start_search()
    assert not s.complete_search(sid1, _results(3))  # stale
    assert s.results == []
    assert s.complete_search(sid2, _results(2))
    assert len(s.results) == 2
    assert not s.searching


def test_fail_search_stale_and_fresh():
    s = AppState()
    sid = s.start_search()
    assert not s.fail_search(sid - 1, "old error")
    assert s.fail_search(sid, "boom")
    assert "boom" in s.status_line


def test_navigation_bounds():
    s = AppState()
    s.complete_search(s.start_search(), _results(3))
    s.update(Msg("up"))
    assert s.selected == 0
    s.update(Msg("down"))
    s.update(Msg("down"))
    s.update(Msg("down"))  # clamped
    assert s.selected == 2


def test_mode_transitions():
    s = AppState()
    s.complete_search(s.start_search(), _results(1))
    s.update(Msg("enter_detail"))
    assert s.mode == Mode.DETAIL
    s.update(Msg("back"))
    assert s.mode == Mode.NORMAL
    s.update(Msg("help"))
    assert s.mode == Mode.HELP
    s.update(Msg("help"))
    assert s.mode == Mode.NORMAL
    s.update(Msg("settings"))
    assert s.mode == Mode.SETTINGS


def test_enter_detail_without_results_stays_normal():
    s = AppState()
    s.update(Msg("enter_detail"))
    assert s.mode == Mode.NORMAL


def test_job_lifecycle_status():
    s = AppState()
    s.update(Msg("job_update", JobStatus("j1", "inprogress", 1, 3)))
    assert s.reindexing
    s.update(Msg("job_update", JobStatus("j1", "completed", 3, 3)))
    assert not s.reindexing
    assert "completed" in s.status_line


def test_unicode_input():
    s = AppState()
    s.update(Msg("char", "é"))
    s.update(Msg("char", "漢"))
    assert s.query == "é漢"
    s.update(Msg("backspace"))
    assert s.query == "é"


def test_clear_query_resets():
    s = AppState()
    s.update(Msg("char", "x"))
    s.complete_search(s.start_search(), _results(2))
    s.update(Msg("clear"))
    assert s.query == "" and s.results == [] and s.selected == 0


# ----- settings -----

def test_validate_weights():
    assert validate("RAG_EMBEDDING_WEIGHT", "0.5") is None
    assert validate("RAG_EMBEDDING_WEIGHT", "1.5") is not None
    assert validate("RAG_EMBEDDING_WEIGHT", "abc") is not None
    assert validate("RAG_EMBEDDING_WEIGHT", "") is None  # clears


def test_validate_bind_and_batch():
    assert validate("MCP_HTTP_BIND", "0.0.0.0:8080") is None
    assert validate("MCP_HTTP_BIND", "nope") is not None
    assert validate("MCP_HTTP_BIND", "host:99999") is not None
    assert validate("EMBEDDING_BATCH_SIZE", "64") is None
    assert validate("EMBEDDING_BATCH_SIZE", "0") is not None


def test_settings_env_roundtrip_preserves_comments(tmp_path):
    env = tmp_path / ".env"
    env.write_text(
        "# my config\n"
        "UNKNOWN_KEY=keepme\n"
        "RAG_EMBEDDING_WEIGHT=0.6\n"
        "\n"
        "# trailing comment\n"
    )
    s = Settings.load(str(env))
    assert s.get("RAG_EMBEDDING_WEIGHT") == "0.6"
    assert s.set("RAG_EMBEDDING_WEIGHT", "0.8") is None
    assert s.set("EMBEDDING_BATCH_SIZE", "64") is None
    s.save()

    text = env.read_text()
    assert "# my config" in text
    assert "UNKNOWN_KEY=keepme" in text
    assert "RAG_EMBEDDING_WEIGHT=0.8" in text
    assert "EMBEDDING_BATCH_SIZE=64" in text
    assert "# trailing comment" in text

    # reload sees the new values
    s2 = Settings.load(str(env))
    assert s2.get("RAG_EMBEDDING_WEIGHT") == "0.8"


def test_settings_clear_removes_line(tmp_path):
    env = tmp_path / ".env"
    env.write_text("RAG_LEXICAL_WEIGHT=0.3\n")
    s = Settings.load(str(env))
    assert s.set("RAG_LEXICAL_WEIGHT", "") is None
    s.save()
    assert "RAG_LEXICAL_WEIGHT" not in env.read_text()


def test_settings_invalid_rejected(tmp_path):
    s = Settings.load(str(tmp_path / ".env"))
    err = s.set("RAG_RERANKER_WEIGHT", "2.0")
    assert err is not None
    assert s.get("RAG_RERANKER_WEIGHT") == ""


def test_settings_rows_cover_all_keys(tmp_path):
    s = Settings.load(str(tmp_path / ".env"))
    assert [r[0] for r in s.rows()] == [k for k, _ in SETTING_KEYS]


# ----- themes -----

def test_theme_cycle():
    seen = {"default"}
    cur = "default"
    for _ in range(len(THEMES)):
        cur = next_theme(cur)
        seen.add(cur)
    assert seen == set(THEMES)
    assert get_theme("nonexistent").name == "default"


# ----- api parsing -----

def test_result_from_json_optional_fields():
    r = TuiSearchResult.from_json(
        {"text": "t", "score": 0.5, "document": "d.pdf", "chunk_id": "c",
         "chunk_index": 1, "page_number": 2}
    )
    assert r.reranker_score is None
    r2 = TuiSearchResult.from_json(
        {"text": "t", "score": 0.5, "document": "d.pdf", "chunk_id": "c",
         "chunk_index": 1, "page_number": 2, "reranker_score": 0.9,
         "yes_logprob": -0.1, "no_logprob": -2.3}
    )
    assert r2.reranker_score == 0.9


# ----- settings validation parity (settings.rs:104-178) -----

def test_settings_validation_three_state(tmp_path):
    from rust_local_rag_tpu.tui.settings import validate

    # weights: finite f32 in [0,1] (settings.rs:153-173)
    assert validate("RAG_EMBEDDING_WEIGHT", "0.5") is None
    assert validate("RAG_EMBEDDING_WEIGHT", "nan")[0] == "error"
    assert validate("RAG_EMBEDDING_WEIGHT", "inf")[0] == "error"
    assert validate("RAG_EMBEDDING_WEIGHT", "1.5")[0] == "error"
    assert validate("RAG_EMBEDDING_WEIGHT", "abc")[0] == "error"
    # URL (settings.rs:107-118)
    assert validate("RAG_TUI_SERVER_URL", "http://localhost:3046") is None
    assert validate("RAG_TUI_SERVER_URL", "localhost:3046")[0] == "error"
    assert validate("RAG_TUI_SERVER_URL", "http://")[0] == "error"
    # directories (settings.rs:121-150)
    assert validate("DATA_DIR", str(tmp_path)) is None
    f = tmp_path / "afile"
    f.write_text("x")
    assert validate("DATA_DIR", str(f))[0] == "error"
    lvl, msg = validate("DATA_DIR", str(tmp_path / "nonexistent"))
    assert lvl == "warning" and "created" in msg
    # checkpoint files
    assert validate("ENCODER_WEIGHTS", str(f)) is None
    assert validate("ENCODER_WEIGHTS", str(tmp_path))[0] == "error"
    assert validate("ENCODER_WEIGHTS", str(tmp_path / "nope.st"))[0] == "warning"


def test_settings_set_applies_warnings_rejects_errors(tmp_path):
    from rust_local_rag_tpu.tui.settings import Settings

    s = Settings(path=str(tmp_path / ".env"))
    assert s.set("RAG_EMBEDDING_WEIGHT", "2.0")  # rejected
    assert "RAG_EMBEDDING_WEIGHT" not in s.values
    out = s.set("DATA_DIR", str(tmp_path / "newdir"))
    assert out.startswith("warning:")
    assert s.values["DATA_DIR"] == str(tmp_path / "newdir")  # applied


# ----- model discovery (the ollama.rs:71-111 analog) -----

def test_model_discovery_lists_assets_and_hermetic(monkeypatch, tmp_path):
    from rust_local_rag_tpu.models import discovery

    monkeypatch.delenv("RAG_TPU_MODELS_DIR", raising=False)
    monkeypatch.delenv("ENCODER_WEIGHTS", raising=False)
    models = discovery.discover_models()
    names = [m["name"] for m in models["embedding"]]
    assert "hash-encoder" in names
    rr = [m["name"] for m in models["rerank"]]
    assert "fake-rr" in rr and "" in rr  # disabled mode is offered

    # a models dir is scanned and metadata summarized
    import jax
    from rust_local_rag_tpu.models.checkpoint import save_params
    from rust_local_rag_tpu.models.encoder import (
        EncoderConfig, init_encoder_params,
    )

    cfg = EncoderConfig(vocab_size=32, dim=8, depth=1, heads=2, ffn_dim=16,
                        max_len=8, activation_dtype="float32", out_dim=12)
    p = init_encoder_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "mini.safetensors")
    save_params(p, path, metadata={"encoder_config": cfg.to_json(),
                                   "trained_steps": "7"})
    monkeypatch.setenv("RAG_TPU_MODELS_DIR", str(tmp_path))
    found = [m for m in discovery.discover_encoder_models()
             if m["kind"] == "checkpoint" and m["path"] == path]
    assert found and "1L x 8d -> 12d, 7 steps" == found[0]["detail"]


def test_choices_for_key(monkeypatch, tmp_path):
    from rust_local_rag_tpu.models import discovery

    monkeypatch.delenv("RAG_TPU_MODELS_DIR", raising=False)
    assert discovery.choices_for_key("DATA_DIR") is None
    rr = discovery.choices_for_key("RAG_TPU_RERANK_MODEL")
    assert "fake-rr" in rr and "" in rr
    enc = discovery.choices_for_key("ENCODER_WEIGHTS")
    assert enc[-1] == ""  # explicit clear option


# ----- settings fidelity: modified tracking, restart flags, cursor editing -----

def test_settings_modified_tracking_and_save(tmp_path):
    env = tmp_path / ".env"
    env.write_text("RAG_EMBEDDING_WEIGHT=0.7\n")
    s = Settings.load(str(env))
    assert not s.is_modified("RAG_EMBEDDING_WEIGHT")
    s.set("RAG_EMBEDDING_WEIGHT", "0.9")
    assert s.is_modified("RAG_EMBEDDING_WEIGHT")
    s.set("RAG_EMBEDDING_WEIGHT", "0.7")  # back to original -> unmodified
    assert not s.is_modified("RAG_EMBEDDING_WEIGHT")
    s.set("RAG_EMBEDDING_WEIGHT", "0.9")
    s.save()  # mark_saved semantics (settings.rs:98-100)
    assert not s.is_modified("RAG_EMBEDDING_WEIGHT")


def test_settings_requires_restart_flags():
    s = Settings()
    assert s.requires_restart("MCP_HTTP_BIND")
    assert s.requires_restart("RAG_EMBEDDING_WEIGHT")  # OnceLock-cached server-side
    assert not s.requires_restart("RAG_TUI_SERVER_URL")  # client-only


def test_settings_edit_cursor_insert_delete():
    import curses

    from rust_local_rag_tpu.tui.main import _handle_settings_key

    class _Ctl:
        settings = Settings()

    st = AppState()
    st.mode = Mode.SETTINGS
    st.settings_editing = True
    st.settings_edit_buffer = "abc"
    st.settings_cursor = 1
    _handle_settings_key(ord("X"), st, _Ctl())  # insert at cursor
    assert st.settings_edit_buffer == "aXbc" and st.settings_cursor == 2
    _handle_settings_key(curses.KEY_BACKSPACE, st, _Ctl())  # delete before cursor
    assert st.settings_edit_buffer == "abc" and st.settings_cursor == 1
    _handle_settings_key(curses.KEY_DC, st, _Ctl())  # delete AT cursor
    assert st.settings_edit_buffer == "ac" and st.settings_cursor == 1
    _handle_settings_key(curses.KEY_HOME, st, _Ctl())
    assert st.settings_cursor == 0
    _handle_settings_key(curses.KEY_END, st, _Ctl())
    assert st.settings_cursor == 2
    _handle_settings_key(curses.KEY_LEFT, st, _Ctl())
    assert st.settings_cursor == 1
    _handle_settings_key(curses.KEY_RIGHT, st, _Ctl())
    assert st.settings_cursor == 2
