"""`python -m rust_local_rag_tpu` — start the RAG server."""

import sys

from rust_local_rag_tpu.server.app import main

sys.exit(main())
