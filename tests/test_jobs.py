"""Job manager, RW lock, progress logger, worker supervisor tests
(job_manager.rs:244-491, worker.rs:575-690, progress_logger.rs)."""

import os
import re
import threading
import time

import pytest

from rust_local_rag_tpu.jobs import (
    Job,
    JobManager,
    JobRequest,
    JobStatus,
    JobType,
    ProgressLogger,
    ProgressState,
    Stage,
    WorkerSupervisor,
)
from rust_local_rag_tpu.models import EmbeddingService, HashEncoder
from rust_local_rag_tpu.engine import RagEngine
from rust_local_rag_tpu.utils.rwlock import (
    RwLock,
    lock_metrics,
    timed_write_guard,
)

import pdfgen


# ----- JobManager CRUD -----

@pytest.fixture
def jm(tmp_path):
    return JobManager(str(tmp_path / "jobs.db"))


def test_create_and_get_job(jm):
    job = jm.create_job(JobType.REINDEX, "/docs", 10)
    assert job.status == JobStatus.PENDING
    assert job.total == 10
    got = jm.get_job(job.job_id)
    assert got is not None and got.job_id == job.job_id


def test_get_missing_job(jm):
    assert jm.get_job("nope") is None


def test_update_status_progress_total(jm):
    job = jm.create_job(JobType.REINDEX, None, 0)
    jm.update_status(job.job_id, JobStatus.IN_PROGRESS)
    jm.update_total(job.job_id, 7)
    jm.update_progress(job.job_id, 3)
    got = jm.get_job(job.job_id)
    assert got.status == JobStatus.IN_PROGRESS
    assert got.total == 7
    assert got.progress == 3
    jm.update_status(job.job_id, JobStatus.FAILED, "boom")
    got = jm.get_job(job.job_id)
    assert got.status == JobStatus.FAILED
    assert got.error == "boom"


def test_find_resumable_jobs(jm):
    a = jm.create_job(JobType.REINDEX, "/a", 0)
    b = jm.create_job(JobType.REINDEX, "/b", 0)
    jm.update_status(a.job_id, JobStatus.IN_PROGRESS)
    c = jm.create_job(JobType.REINDEX, "/c", 0)
    jm.update_status(c.job_id, JobStatus.COMPLETED)
    resumable = {j.job_id for j in jm.find_resumable_jobs()}
    assert resumable == {a.job_id, b.job_id}


def test_create_if_not_active_blocks_duplicate(jm):
    first = jm.create_reindex_job_if_not_active("/docs", 0)
    assert first is not None
    second = jm.create_reindex_job_if_not_active("/docs", 0)
    assert second is None
    jm.update_status(first.job_id, JobStatus.COMPLETED)
    third = jm.create_reindex_job_if_not_active("/docs", 0)
    assert third is not None


def test_concurrent_create_race_exactly_one_wins(tmp_path):
    """10-way race: exactly one creator wins (job_manager.rs:410-490)."""
    jm = JobManager(str(tmp_path / "race.db"))
    results = []
    barrier = threading.Barrier(10)

    def attempt():
        barrier.wait()
        results.append(jm.create_reindex_job_if_not_active("/docs", 0))

    threads = [threading.Thread(target=attempt) for _ in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [r for r in results if r is not None]
    assert len(winners) == 1
    assert len(results) == 10


def test_find_active_reindex_job(jm):
    assert jm.find_active_reindex_job() is None
    job = jm.create_reindex_job_if_not_active(None, 0)
    active = jm.find_active_reindex_job()
    assert active is not None and active.job_id == job.job_id


# ----- RW lock + timed guard -----

def test_rwlock_concurrent_readers():
    lock = RwLock()
    inside = []
    with lock.read():
        assert lock.acquire_read(timeout=0.1)
        lock.release_read()
        inside.append(1)
    assert inside


def test_rwlock_writer_excludes_readers():
    lock = RwLock()
    with lock.write():
        assert not lock.acquire_read(timeout=0.05)
        assert not lock.acquire_write(timeout=0.05)


def test_timed_guard_records_metrics():
    lock = RwLock()
    lock_metrics.reset()
    with timed_write_guard(lock, "test-hold"):
        time.sleep(0.05)
    assert lock_metrics.max_held_ms() >= 40


def test_timed_guard_timeout():
    lock = RwLock()
    lock.acquire_write()
    with pytest.raises(TimeoutError):
        with timed_write_guard(lock, "blocked", timeout=0.05):
            pass
    lock.release_write()


# ----- progress logger -----

def test_progress_log_line_format(tmp_path):
    pl = ProgressLogger(str(tmp_path))
    state = ProgressState(job_id="job-1", total_docs=10)
    state.stage = Stage.EMBEDDING
    state.done_docs = 5
    state.success_docs = 4
    state.failed_docs = 1
    state.skipped_docs = 2
    state.embedded_docs = 2
    state.last_doc = "my doc.pdf"
    pl.emit(state, "progress", "note with spaces")

    line = open(tmp_path / "progress_tracking.log").read().strip()
    assert re.match(r"^ts=\d+ job=job-1 event=progress stage=embedding ", line)
    assert "done=5 total=10 success=4 failed=1 skipped=2 embedded=2" in line
    assert "pct=50" in line
    assert "last_doc=my%20doc.pdf" in line
    assert "note=note%20with%20spaces" in line
    assert re.search(r"dps=\d+\.\d\d ", line)
    assert re.search(r"eta_s=\d+ ", line)


def test_progress_batch_line(tmp_path):
    from rust_local_rag_tpu.jobs import BatchProgress

    pl = ProgressLogger(str(tmp_path))
    state = ProgressState(job_id="j2", total_docs=4)
    pl.emit_batch(
        state,
        BatchProgress(
            document_name="a b.pdf",
            batch_index=2,
            batch_count=4,
            chunks_in_batch=32,
            total_chunks=100,
        ),
    )
    line = open(tmp_path / "progress_tracking.log").read().strip()
    assert "event=batch stage=embedding" in line
    assert "current_batch=2 total_batches=4 batch_pct=50" in line
    assert "total_chunks=100 chunks_in_batch=32" in line
    assert "last_doc=a%20b.pdf" in line
    assert "note=batch%202/4%20complete" in line


def test_progress_state_math():
    state = ProgressState(job_id="x", total_docs=0)
    assert state.percent() == 0
    assert state.docs_per_sec() == 0.0
    assert state.eta_seconds() == 0


# ----- worker end-to-end -----

def _make_runtime(tmp_path, docs):
    data_dir = tmp_path / "data"
    docs_dir = tmp_path / "documents"
    data_dir.mkdir()
    docs_dir.mkdir()
    for name, body in docs.items():
        (docs_dir / name).write_bytes(pdfgen.make_pdf([body]))
    svc = EmbeddingService(HashEncoder(dim=32, model_name="worker-test"))
    engine = RagEngine(str(data_dir), svc)
    lock = RwLock()
    jm = JobManager(str(data_dir / "jobs.db"))
    sup = WorkerSupervisor(jm, engine, lock, log_dir=str(tmp_path / "logs"))
    return engine, lock, jm, sup, docs_dir


def _wait_for(jm, job_id, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        job = jm.get_job(job_id)
        if job and job.status in (JobStatus.COMPLETED, JobStatus.FAILED):
            return job
        time.sleep(0.05)
    raise TimeoutError("job did not finish")


def test_worker_reindex_end_to_end(tmp_path):
    docs = {
        "one.pdf": "Alpha document about testing pipelines and sentences.",
        "two.pdf": "Beta document about completely different things entirely.",
    }
    engine, lock, jm, sup, docs_dir = _make_runtime(tmp_path, docs)
    sup.start()
    try:
        job = jm.create_reindex_job_if_not_active(str(docs_dir), 0)
        sup.submit(JobRequest(job.job_id, str(docs_dir)))
        done = _wait_for(jm, job.job_id)
        assert done.status == JobStatus.COMPLETED
        assert done.error is None
        assert done.total == 2
        assert done.progress == 2
        assert engine.get_stats()["documents"] == 2
        # progress log written with expected events
        log = (tmp_path / "logs" / "progress_tracking.log").read_text()
        assert "event=stage" in log
        assert "event=progress" in log
        assert "event=done" in log
    finally:
        sup.stop(timeout=2)


def test_worker_poison_pill_continues(tmp_path):
    docs = {"good.pdf": "A perfectly fine document with several words."}
    engine, lock, jm, sup, docs_dir = _make_runtime(tmp_path, docs)
    (docs_dir / "broken.pdf").write_bytes(b"this is not a pdf")
    sup.start()
    try:
        job = jm.create_reindex_job_if_not_active(str(docs_dir), 0)
        sup.submit(JobRequest(job.job_id, str(docs_dir)))
        done = _wait_for(jm, job.job_id)
        # completes WITH a failure summary (worker.rs:545-566)
        assert done.status == JobStatus.COMPLETED
        assert done.error is not None
        assert "broken.pdf" in done.error
        assert "1 failures out of 2" in done.error
        assert engine.get_stats()["documents"] == 1
    finally:
        sup.stop(timeout=2)


def test_worker_unreadable_file_counts_as_failure(tmp_path):
    """A file whose read() fails is a failed document, and progress still
    reaches total (ADVICE r1: it used to be silently skipped with progress
    stuck below total)."""
    docs = {"good.pdf": "A perfectly fine document with several words."}
    engine, lock, jm, sup, docs_dir = _make_runtime(tmp_path, docs)
    # a dangling symlink: listed by discovery, open() raises OSError
    # (works even as root, where chmod-0 files stay readable)
    os.symlink(str(docs_dir / "nonexistent-target"), str(docs_dir / "locked.pdf"))
    sup.start()
    try:
        job = jm.create_reindex_job_if_not_active(str(docs_dir), 0)
        sup.submit(JobRequest(job.job_id, str(docs_dir)))
        done = _wait_for(jm, job.job_id)
        assert done.status == JobStatus.COMPLETED
        assert done.progress == done.total == 2
        assert done.error is not None and "locked.pdf" in done.error
    finally:
        sup.stop(timeout=2)


def test_worker_resumes_pending_jobs(tmp_path):
    docs = {"doc.pdf": "Resume test document with some sentences inside."}
    engine, lock, jm, sup, docs_dir = _make_runtime(tmp_path, docs)
    # job exists in DB before the supervisor starts (simulates crash/restart)
    job = jm.create_reindex_job_if_not_active(str(docs_dir), 0)
    sup.start()
    try:
        done = _wait_for(jm, job.job_id)
        assert done.status == JobStatus.COMPLETED
    finally:
        sup.stop(timeout=2)


def test_worker_searches_live_during_reindex(tmp_path):
    """Reads proceed between per-document write locks."""
    docs = {f"d{i}.pdf": f"Document number {i} about topic {i}." for i in range(4)}
    engine, lock, jm, sup, docs_dir = _make_runtime(tmp_path, docs)
    sup.start()
    try:
        job = jm.create_reindex_job_if_not_active(str(docs_dir), 0)
        sup.submit(JobRequest(job.job_id, str(docs_dir)))
        # poll searches while the job runs; none may deadlock
        for _ in range(10):
            with lock.read(timeout=5.0):
                engine.search("topic", 2)
            time.sleep(0.01)
        _wait_for(jm, job.job_id)
    finally:
        sup.stop(timeout=2)
