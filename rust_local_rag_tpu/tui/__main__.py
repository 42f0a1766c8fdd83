"""`python -m rust_local_rag_tpu.tui` — start the terminal client."""

import sys

from rust_local_rag_tpu.tui.main import main

sys.exit(main())
