"""Device MMR vs. the oracle port of rag_engine.rs:767-839."""

import numpy as np
import jax.numpy as jnp

from rust_local_rag_tpu.ops import mmr_select
import oracle


def _mk_candidates(rng, p, d):
    emb = np.stack([oracle.normalize(rng.standard_normal(d).astype(np.float32)) for _ in range(p)])
    rel = np.sort(rng.uniform(0.0, 1.0, p).astype(np.float32))[::-1].copy()
    return emb, rel


def test_mmr_lambda_zero_is_pure_relevance(rng):
    emb, rel = _mk_candidates(rng, 20, 32)
    got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 5, 0.0))
    # relevance is sorted desc, so pure relevance selects 0..4 in order
    assert got.tolist() == [0, 1, 2, 3, 4]


def test_mmr_matches_oracle_selection_set(rng):
    for seed in range(4):
        r = np.random.default_rng(seed)
        emb, rel = _mk_candidates(r, 30, 16)
        for lam in (0.2, 0.3, 0.7):
            got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 8, lam))
            want = oracle.mmr_diversify(emb, rel, 8, lam)
            assert got[: len(want)].tolist() == want, f"seed={seed} lam={lam}"


def test_mmr_penalizes_duplicates(rng):
    d = 16
    base = oracle.normalize(rng.standard_normal(d).astype(np.float32))
    other = oracle.normalize(rng.standard_normal(d).astype(np.float32))
    # candidates 0 and 1 are identical; 2 is different but slightly less relevant
    emb = np.stack([base, base, other])
    rel = np.array([1.0, 0.99, 0.9], dtype=np.float32)
    got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 2, 0.5))
    assert got.tolist() == [0, 2]


def test_mmr_skips_nonfinite_relevance(rng):
    emb, rel = _mk_candidates(rng, 10, 8)
    rel = rel.copy()
    rel[1] = np.nan
    rel[2] = np.inf
    got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 5, 0.3))
    want = oracle.mmr_diversify(emb, rel, 5, 0.3)
    assert got[: len(want)].tolist() == want
    assert 1 not in got.tolist()


def test_mmr_all_nonfinite_after_first_stops(rng):
    emb, _ = _mk_candidates(rng, 6, 8)
    rel = np.full(6, np.nan, dtype=np.float32)
    got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 4, 0.3))
    # First pick is unconditional (swap_remove(0)); everything after stops.
    assert got[0] == 0
    assert (got[1:] == -1).all()


def test_mmr_k_exceeds_pool(rng):
    emb, rel = _mk_candidates(rng, 3, 8)
    got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 6, 0.3))
    assert set(got[:3].tolist()) == {0, 1, 2}
    assert (got[3:] == -1).all()


def test_mmr_valid_count_ignores_padding(rng):
    emb, rel = _mk_candidates(rng, 12, 8)
    rel[8:] = 10.0  # padded tail looks great but must never be selected
    got = np.asarray(
        mmr_select(jnp.asarray(emb), jnp.asarray(rel), 5, 0.3, valid_count=jnp.int32(8))
    )
    assert (got[got >= 0] < 8).all()
    want = oracle.mmr_diversify(emb[:8], rel[:8], 5, 0.3)
    assert got[: len(want)].tolist() == want


def test_mmr_formula_exact_two_candidates():
    # Hand-checked MMR arithmetic (reference formula :808-809)
    emb = np.array([[1.0, 0.0], [0.8, 0.6], [0.0, 1.0]], dtype=np.float32)
    rel = np.array([0.9, 0.8, 0.5], dtype=np.float32)
    lam = 0.4
    # after picking 0: mmr(1) = .6*.8 - .4*.8 = .16 ; mmr(2) = .6*.5 - .4*0 = .30
    got = np.asarray(mmr_select(jnp.asarray(emb), jnp.asarray(rel), 2, lam))
    assert got.tolist() == [0, 2]
