"""Background job system: SQLite-persisted jobs, worker supervisor,
machine-parsable progress log."""

from rust_local_rag_tpu.jobs.job_manager import (  # noqa: F401
    Job,
    JobManager,
    JobStatus,
    JobType,
)
from rust_local_rag_tpu.jobs.progress_logger import (  # noqa: F401
    BatchProgress,
    ProgressLogger,
    ProgressState,
    Stage,
)
from rust_local_rag_tpu.jobs.worker import JobRequest, WorkerSupervisor  # noqa: F401
