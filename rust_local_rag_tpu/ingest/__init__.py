"""Host-side ingest: PDF text extraction and sentence-aware chunking."""

from rust_local_rag_tpu.ingest.chunking import (  # noqa: F401
    ChunkFragment,
    chunk_text,
    extract_sentences,
    approximate_token_count,
    is_heading,
)
from rust_local_rag_tpu.ingest.pdf import extract_pdf_text  # noqa: F401
