"""Oracle validation used by scale_check: re-derive the reference's scoring
loop in NumPy over the live engine's state and compare rankings."""

from __future__ import annotations

import numpy as np


def validate(eng, rng, n_queries: int = 3, top_k: int = 20) -> bool:
    emb_rows, metas = eng.store.snapshot_host()
    id_by_row = [m.id for m in metas]

    ok = True
    for qi in range(n_queries):
        q = rng.standard_normal(emb_rows.shape[1]).astype(np.float32)
        q /= np.linalg.norm(q)

        # drive the engine with this exact embedding via the query cache
        query_text = f"__oracle_probe_{qi}__"
        eng.embedding_service._cache.put(query_text, q)

        res = eng.search(query_text, top_k)
        got_ids = [r.chunk_id for r in res]

        lex_pairs = dict(eng.lexical_index.score(query_text, top_k * 5))
        emb_scores = emb_rows @ q
        lex = np.array(
            [lex_pairs.get(cid, 0.0) for cid in id_by_row], dtype=np.float32
        )
        max_lex = max(float(lex.max()) if lex.size else 0.0, 1.1920929e-07)
        combined = 0.7 * emb_scores + 0.3 * (lex / max_lex)
        want_rows = np.argsort(-combined, kind="stable")[:top_k]
        want_ids = [id_by_row[i] for i in want_rows]

        if got_ids != want_ids:
            mismatch = sum(1 for a, b in zip(got_ids, want_ids) if a != b)
            print(f"  query {qi}: {mismatch}/{top_k} rank mismatches")
            ok = False
    return ok
