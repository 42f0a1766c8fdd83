"""Held-out TEST split of the quality evaluation: report-only queries.

The 45 retrieval + 5 rejection queries in corpus_data.py double as the
development set: blend weights, hybrid weights, and training-recipe
adoption decisions were all selected against them (scripts/sweep_*.py),
so scores on that split risk quietly overfitting the configuration to
the measurement. This module is the control: a second authored query set
over the SAME 18 documents (corpus_data.DOCS), written once and never
consulted by any sweep or adoption decision. Report it alongside the dev
split (scripts/quality_eval.py --heldout); a large dev-minus-heldout gap
is the overfitting alarm.

Same design discipline as the dev split (see corpus_data.py docstring):
three difficulty tiers, paraphrase queries with minimal lexical overlap
for medium, trap keywords that lexically point at OTHER documents for
hard, and rejection queries nothing in the corpus answers. Where
possible, queries target pages the dev split leaves unqueried, so the
two splits also differ in gold coverage, not just wording.

Reference anchor: the reference's eval spec recommends exactly this
dev/test hygiene for its 50-query suite
(/root/reference/docs/RAG_EVALUATION_FRAMEWORK_SPEC.md:115-205); its
published 77.8% hit@5 is a single-split number.
"""

# Fields: (query, doc, page (1-based), difficulty, expected_answer_gist)
HELDOUT_QUERIES = [
    # arrays_guide
    ("I added a plain Python number to my single-precision array — does "
     "the result silently become double precision?",
     "arrays_guide.pdf", 3, "medium",
     "scalar operands are weaker than arrays; float32 is preserved"),
    ("Why can chaining several elementwise kernels over an array avoid "
     "writing any intermediate buffers to memory?",
     "arrays_guide.pdf", 5, "hard",
     "the runtime fuses chains of unary operations to skip intermediates"),

    # dataframe_handbook
    ("How does split-apply-combine turn per-group aggregates back into a "
     "table?",
     "dataframe_handbook.pdf", 2, "easy",
     "partition rows by key, aggregate each partition, stitch results"),
    ("A column holds only a dozen repeated string values — how do I store "
     "it compactly and still sort it by a custom order?",
     "dataframe_handbook.pdf", 5, "medium",
     "categorical dictionary with small integer codes; ordered categories"),

    # optimizer_manual
    ("Can deliberately noisier parameter updates ever produce a better "
     "final model?",
     "optimizer_manual.pdf", 1, "medium",
     "small-batch noise helps escape sharp minima"),
    ("What lets an optimizer take long steps along flat directions of the "
     "loss but short ones across steep valleys, affordably?",
     "optimizer_manual.pdf", 5, "medium",
     "curvature preconditioning via diagonal/Kronecker approximations"),

    # training_pipeline
    ("How do I get more training examples without collecting any new "
     "data?",
     "training_pipeline.pdf", 4, "medium",
     "random label-preserving transformations multiply the dataset"),
    ("The chip finishes each step and then sits waiting for the next "
     "batch to be prepared — what fixes this?",
     "training_pipeline.pdf", 5, "medium",
     "background-worker pipelines prefetch batches ahead of the device"),

    # gpu_programming
    ("Why do matrix kernels stage small tiles of their operands in "
     "on-chip scratch, and why not make the tiles huge?",
     "gpu_programming.pdf", 3, "hard",
     "tiles buy reuse of loaded elements; size trades against occupancy"),
    ("Can transfers to the device overlap with computation, and what does "
     "that require of the host buffers?",
     "gpu_programming.pdf", 5, "easy",
     "separate streams overlap; pinned host memory makes copies async"),

    # memory_management
    ("What allocation pattern can per-object reference counters never "
     "reclaim on their own?",
     "memory_management.pdf", 3, "medium",
     "reference cycles never reach zero; a cycle detector is needed"),
    ("Why do managed runtimes reclaim recently created objects far more "
     "often than long-lived ones?",
     "memory_management.pdf", 4, "medium",
     "generational collection: most objects die young, nursery collected often"),

    # database_internals
    ("I deleted half my table but the file on disk didn't shrink — do I "
     "need the compaction my log-structured friends keep mentioning?",
     "database_internals.pdf", 5, "hard",
     "vacuum marks space reusable; full compaction rewrites under a lock"),
    ("Why don't my long-running reports ever block the applications that "
     "keep writing to the same rows — and whose snapshot wins?",
     "database_internals.pdf", 4, "hard",
     "MVCC: writers create new versions; readers see their snapshot"),

    # networking_guide
    ("Why add randomness to the delay before resending a failed request?",
     "networking_guide.pdf", 2, "medium",
     "jitter prevents synchronized retry herds; budgets cap amplification"),
    ("How does a front-end keep routing a given user to the replica that "
     "already has their data warm?",
     "networking_guide.pdf", 4, "medium",
     "consistent hashing pins a key to a replica"),
    ("How do modern senders keep router queues nearly empty instead of "
     "pushing until packets drop?",
     "networking_guide.pdf", 1, "medium",
     "delay-modeling congestion control keeps buffers shallow"),

    # text_processing
    ("Search should treat 'running' and 'ran' as the same word — what are "
     "the cheap and the careful ways to do that?",
     "text_processing.pdf", 2, "medium",
     "rule-based stemming is fast; dictionary lemmatization is accurate"),
    ("A language model built from raw corpus counts gives zero chance to "
     "sentences it never saw — how is that repaired?",
     "text_processing.pdf", 3, "medium",
     "smoothing redistributes mass; backoff falls to shorter contexts"),

    # search_engines
    ("How does a web collector avoid storing the same page reached "
     "through many different addresses?",
     "search_engines.pdf", 3, "medium",
     "canonicalize URLs and fingerprint content for duplicate detection"),
    ("How does the results page choose which fragment of a matching "
     "document to display under the link?",
     "search_engines.pdf", 4, "medium",
     "window covering most query terms at sentence boundaries, highlighted"),

    # neural_networks
    ("How do discrete words enter a network as geometry, and why do "
     "related words end up near each other?",
     "neural_networks.pdf", 5, "medium",
     "learned embedding table; similar roles drift close in vector space"),

    # probability_primer
    ("Why do so many unrelated physical measurements come out "
     "bell-shaped?",
     "probability_primer.pdf", 2, "medium",
     "central limit theorem: sums of small independent effects"),
    ("I ran twenty experiments and exactly one came out significant — why "
     "should I distrust it?",
     "probability_primer.pdf", 4, "medium",
     "multiple comparisons inflate false alarms without correction"),
    ("Does a 95 percent interval mean there's a 95 percent chance the "
     "true value lies inside it?",
     "probability_primer.pdf", 5, "medium",
     "coverage is over repeated experiments; one interval contains it or not"),

    # linear_algebra
    ("Why factor a matrix into simpler pieces instead of inverting it "
     "head-on?",
     "linear_algebra.pdf", 1, "medium",
     "factors expose structure; triangular solves are cheap substitution"),
    ("What's the simplest way to find the direction a matrix stretches "
     "most, using nothing but repeated multiplication?",
     "linear_algebra.pdf", 2, "easy",
     "power iteration: apply repeatedly and renormalize"),
    ("My predictors are nearly redundant copies of each other — why does "
     "adding a small penalty that shrinks the weights rescue the fit?",
     "linear_algebra.pdf", 5, "hard",
     "regularization trades bias for variance under collinearity"),

    # signal_processing
    ("What algorithmic factorization made frequency analysis cheap enough "
     "to become the default representation?",
     "signal_processing.pdf", 1, "medium",
     "divide-and-conquer FFT: n log n instead of quadratic"),
    ("Which filter family can never go unstable and preserves the "
     "waveform's shape exactly, and what does it cost?",
     "signal_processing.pdf", 3, "medium",
     "FIR: unconditionally stable, linear phase, needs more coefficients"),
    ("A faint tone right next to a loud one vanishes from my spectrum "
     "unless I change the analysis window — why?",
     "signal_processing.pdf", 5, "hard",
     "rectangular slicing leaks; tapered windows lower sidelobes"),

    # compilers_handbook
    ("What are the two main styles of turning a token stream into a "
     "syntax tree, and their trade-offs?",
     "compilers_handbook.pdf", 1, "easy",
     "recursive descent (precise errors) vs generated table-driven"),
    ("Why do optimizers first rewrite the program so every variable is "
     "assigned exactly once?",
     "compilers_handbook.pdf", 2, "medium",
     "SSA makes def-use chains explicit; passes become simple worklists"),
    ("Live values outnumber the machine's registers — how does the code "
     "generator decide what spills to the stack?",
     "compilers_handbook.pdf", 3, "hard",
     "color the interference graph; spill least valuable; split live ranges"),

    # concurrency_patterns
    ("Two threads each hold one resource and wait forever for the "
     "other's — what discipline makes this impossible?",
     "concurrency_patterns.pdf", 1, "medium",
     "a global lock acquisition order breaks the deadlock conditions"),
    ("A shared value changed and changed back between my read and my "
     "swap — why did the stale update still land, and what prevents it?",
     "concurrency_patterns.pdf", 2, "medium",
     "ABA hazard of compare-and-swap; version counters defuse it"),
    ("One accidental blocking call froze every connection my "
     "single-threaded server was juggling — what architecture is this?",
     "concurrency_patterns.pdf", 3, "medium",
     "event loop: blocking stalls all tasks; ship slow work to workers"),
    ("How does handing ownership of data along with each message remove "
     "the need for locks?",
     "concurrency_patterns.pdf", 5, "medium",
     "channels transfer ownership; bounded channels give backpressure"),

    # storage_systems
    ("Why does a cluster wait for just over half its members to "
     "acknowledge a write before confirming it?",
     "storage_systems.pdf", 2, "medium",
     "any two majorities overlap, so committed writes survive a failure"),
    ("How do I survive two simultaneous disk failures without paying for "
     "three full copies of everything?",
     "storage_systems.pdf", 3, "medium",
     "erasure coding: k data + m parity fragments, any k reconstruct"),
    ("Lookups for keys that were never stored keep hammering the slow "
     "tier behind my cache — what two protections stop them?",
     "storage_systems.pdf", 4, "hard",
     "negative caching remembers misses; stampede protection collapses fills"),
    ("Should a write-heavy store merge similar-sized sorted runs, or keep "
     "strictly sized levels? What's the trade?",
     "storage_systems.pdf", 5, "medium",
     "size-tiered is write-cheap, leveled is read/space-cheap"),

    # image_processing
    ("How does sliding one small kernel across a picture implement "
     "blurring, sharpening, and edge finding alike?",
     "image_processing.pdf", 1, "hard",
     "spatial filtering: weighted neighborhood sums; derivative kernels find edges"),
    ("Shrinking my photo created swirly patterns that weren't in the "
     "original — what went wrong?",
     "image_processing.pdf", 3, "medium",
     "downscaling without prefiltering aliases fine patterns into moire"),
    ("Why does a heavily compressed photo look fine on screen but fall "
     "apart the moment I brighten its shadows in an editor?",
     "image_processing.pdf", 5, "medium",
     "quantization discarded high-frequency precision; editing exposes it"),
]

# Nothing in the corpus answers these.
HELDOUT_REJECTION_QUERIES = [
    "What is the boiling point of ethanol at sea level?",
    "Which team won the 1998 FIFA World Cup final?",
    "How long should green tea steep for the best flavor?",
    "What is the capital city of Tasmania?",
    "When was the Eiffel Tower completed and how tall is it?",
]

assert len(HELDOUT_QUERIES) == 45, len(HELDOUT_QUERIES)
assert len(HELDOUT_REJECTION_QUERIES) == 5

# ---- round-3 extension (heldout_data_v3.py): same growth as the dev
# split — 153 retrieval + 15 rejection total (VERDICT r2 weak #4).
from eval_harness.heldout_data_v3 import (  # noqa: E402
    HELDOUT_QUERIES_V3,
    HELDOUT_REJECTION_QUERIES_V3,
)

HELDOUT_QUERIES = HELDOUT_QUERIES + HELDOUT_QUERIES_V3
HELDOUT_REJECTION_QUERIES = (
    HELDOUT_REJECTION_QUERIES + HELDOUT_REJECTION_QUERIES_V3
)

assert len(HELDOUT_QUERIES) == 157, len(HELDOUT_QUERIES)
assert len(HELDOUT_REJECTION_QUERIES) == 15
