# TUI-centric workflows (cf. the reference's justfile)

set shell := ["bash", "-c"]

bind := env_var_or_default("MCP_HTTP_BIND", "127.0.0.1:3046")

# start the server in the background, then the TUI against it
up:
    python -m rust_local_rag_tpu & \
    for i in $(seq 1 60); do curl -sf http://{{bind}}/readyz >/dev/null && break; sleep 1; done; \
    python -m rust_local_rag_tpu.tui

# quick search from the shell
search query top_k="5":
    curl -s -X POST http://{{bind}}/search -H 'Content-Type: application/json' \
        -d '{"query": "{{query}}", "top_k": {{top_k}}}' | python -m json.tool

stats:
    curl -s http://{{bind}}/stats | python -m json.tool

health:
    curl -s -o /dev/null -w "healthz: %{http_code}\n" http://{{bind}}/healthz; \
    curl -s -o /dev/null -w "readyz: %{http_code}\n" http://{{bind}}/readyz

reindex:
    curl -s -X POST http://{{bind}}/reindex | python -m json.tool

jobs:
    curl -s http://{{bind}}/jobs/active | python -m json.tool
