"""The quality-evaluation corpus: documents, passages, and ground truth.

Authored specifically for this framework (original text, never part of any
training corpus — the encoder trains on harvested package docstrings, see
training/corpus.py, so every eval passage is unseen at training time).

Design goals, mirroring the reference's evaluation-framework spec
(/root/reference/docs/RAG_EVALUATION_FRAMEWORK_SPEC.md:115-205) but built
to be HARD for lexical matching:

* 18 documents x 5 pages, all in one register (technical manuals) with
  heavy cross-document vocabulary overlap — "index", "checkpoint",
  "convolution", "pool", "compaction", "cache" each appear in several
  documents with different meanings (keyword traps).
* 45 retrieval queries in three difficulty tiers:
    easy   — some content words shared with the gold passage;
    medium — paraphrased, little lexical overlap;
    hard   — paraphrased AND containing trap keywords that lexically point
             at a different document.
* 5 rejection queries with no relevant content anywhere.
"""

# Each document: name, category, list of page texts (page i is PDF page i+1).
DOCS = [
    {
        "doc": "arrays_guide.pdf",
        "category": "numerics",
        "pages": [
            # p1 broadcasting
            "BROADCASTING\n"
            "When two arrays with different shapes are combined, the smaller "
            "shape is virtually stretched along size-one dimensions until both "
            "operands agree. No data is copied during this alignment: the "
            "stretched operand reuses the same underlying buffer with a zero "
            "stride. Shape compatibility is checked from the trailing dimension "
            "backwards, and a mismatch on any non-unit dimension raises an "
            "error before any arithmetic runs.",
            # p2 views vs copies
            "VIEWS AND COPIES\n"
            "Basic slicing returns a view: a new header that shares the parent "
            "buffer, so writing through the slice mutates the original. Fancy "
            "indexing with integer or boolean arrays must gather scattered "
            "elements and therefore always materializes a fresh copy. To test "
            "whether two arrays alias the same memory, compare their base "
            "pointers rather than their contents.",
            # p3 dtype promotion
            "TYPE PROMOTION\n"
            "Mixing operand types triggers promotion to the smallest type that "
            "can represent both without loss. Integer and floating operands "
            "promote to floating point; signed and unsigned integers of the "
            "same width promote to the next wider signed type. Scalar operands "
            "are weaker than array operands, so adding a Python float to a "
            "float32 array keeps the result in float32.",
            # p4 strides / layout
            "MEMORY LAYOUT\n"
            "An array is a buffer plus a stride vector giving the byte step "
            "for each axis. Row-major layout places the last axis contiguously; "
            "transposing merely swaps stride entries without touching data. "
            "Iterating along the contiguous axis is fastest because successive "
            "loads hit the same cache lines; traversal against the strides can "
            "be an order of magnitude slower.",
            # p5 vectorization / ufuncs
            "VECTORIZED OPERATIONS\n"
            "Elementwise kernels compiled in the library's inner loops replace "
            "interpreted per-element code. A whole-array expression dispatches "
            "one kernel per operator, and the runtime may fuse chains of "
            "unary operations to avoid writing intermediates. Reductions "
            "accept an axis argument and can accumulate in a wider type to "
            "limit rounding drift on long sums.",
        ],
    },
    {
        "doc": "dataframe_handbook.pdf",
        "category": "data",
        "pages": [
            # p1 joins
            "JOINING TABLES\n"
            "A join matches rows of two tables on key columns. Inner joins "
            "keep only keys present on both sides; left joins preserve every "
            "row of the first table and fill the unmatched side with missing "
            "markers. When keys repeat, the result contains the cartesian "
            "product of the matching groups, which can multiply the row count "
            "unexpectedly — validate key uniqueness before merging.",
            # p2 groupby
            "GROUPED AGGREGATION\n"
            "Split-apply-combine partitions rows by the values of one or more "
            "columns, applies an aggregate such as sum or mean to each "
            "partition, and stitches the results into a new table indexed by "
            "the group labels. Multiple aggregates can run in one pass, and "
            "transform variants broadcast the per-group result back to the "
            "original row positions.",
            # p3 missing data
            "MISSING VALUES\n"
            "Absent observations are stored as sentinel markers that "
            "propagate through arithmetic: any operation touching a missing "
            "value yields a missing result unless the aggregate explicitly "
            "skips them. Imputation strategies include filling forward from "
            "the last valid observation, substituting a column statistic such "
            "as the median, or dropping incomplete rows entirely.",
            # p4 resampling
            "TIME SERIES RESAMPLING\n"
            "Resampling converts a series between sampling frequencies. "
            "Downsampling buckets timestamps into coarser windows and "
            "aggregates each bucket; upsampling introduces new timestamps "
            "whose values are filled by interpolation or carried forward. "
            "Window boundaries may be anchored to calendar units so that "
            "daily buckets align with midnight rather than the first sample.",
            # p5 categoricals
            "CATEGORICAL ENCODING\n"
            "Columns with few distinct values compress well as categories: "
            "each value is stored once in a dictionary and rows hold small "
            "integer codes. Ordered categories support comparisons and "
            "sorting by rank. For modeling, one-hot encoding expands each "
            "category into an indicator column, while target encoding "
            "replaces codes with a statistic of the response variable.",
        ],
    },
    {
        "doc": "optimizer_manual.pdf",
        "category": "ml_training",
        "pages": [
            # p1 sgd
            "STOCHASTIC GRADIENT DESCENT\n"
            "Each update estimates the loss gradient on a small random batch "
            "and steps the parameters against it. Smaller batches give "
            "noisier but cheaper steps; the noise can help escape sharp "
            "minima. The step size is the critical setting: too large "
            "diverges, too small crawls. Decaying it over training typically "
            "improves the final solution.",
            # p2 momentum / adam
            "MOMENTUM AND ADAPTIVE METHODS\n"
            "Momentum accumulates an exponential moving average of past "
            "gradients so persistent directions compound while oscillations "
            "cancel. Adaptive methods additionally track a running estimate "
            "of the per-parameter gradient magnitude and divide the step by "
            "it, equalizing progress across parameters whose scales differ "
            "by orders of magnitude.",
            # p3 schedules
            "LEARNING RATE SCHEDULES\n"
            "A warmup phase ramps the step size from zero so early updates "
            "on a randomly initialized model do not destabilize it. "
            "Afterwards, cosine decay smoothly anneals the rate toward zero, "
            "while step schedules drop it by a factor at fixed milestones. "
            "Cyclical schedules periodically raise the rate again to "
            "traverse between basins.",
            # p4 clipping
            "GRADIENT CLIPPING\n"
            "Rare batches can produce gradients orders of magnitude larger "
            "than usual, and a single such update can undo hours of "
            "training. Clipping rescales the whole gradient vector when its "
            "norm exceeds a threshold, preserving direction while bounding "
            "the step length. Per-element clamping is cruder: it distorts "
            "direction but guards against infinities.",
            # p5 second order
            "CURVATURE-AWARE OPTIMIZATION\n"
            "Second-order methods precondition the step with curvature "
            "information, taking large steps along flat directions and small "
            "ones across steep valleys. Exact Hessians are intractable at "
            "scale, so practical variants use diagonal or Kronecker-factored "
            "approximations, or build curvature estimates from the history "
            "of gradient differences.",
        ],
    },
    {
        "doc": "training_pipeline.pdf",
        "category": "ml_training",
        "pages": [
            # p1 checkpointing (TRAP with database WAL checkpoint)
            "MODEL CHECKPOINTING\n"
            "Long runs must survive preemption. At fixed intervals the "
            "trainer serializes model parameters and optimizer state to "
            "durable storage, writing to a temporary file and renaming it so "
            "a crash never leaves a truncated snapshot. On restart the "
            "latest valid snapshot is loaded and the data pipeline is fast-"
            "forwarded to the recorded step so no batch is seen twice.",
            # p2 early stopping
            "EARLY STOPPING\n"
            "Validation loss is monitored on a held-out split; when it fails "
            "to improve for a patience window, training halts and the best-"
            "scoring weights are restored. This guards against overfitting: "
            "the training loss keeps falling while generalization quietly "
            "degrades. The patience must exceed normal metric noise or "
            "training stops prematurely.",
            # p3 mixed precision
            "MIXED PRECISION\n"
            "Matrix units reach peak throughput on half-width floats, so the "
            "forward and backward passes run in reduced precision while a "
            "full-precision master copy of the weights accumulates updates. "
            "A loss-scaling factor inflates small gradients above the "
            "representable floor and is unwound before the update; overflow "
            "in any gradient skips that step and lowers the scale.",
            # p4 augmentation
            "DATA AUGMENTATION\n"
            "Random label-preserving transformations of each training "
            "example — crops, flips, color jitter, noise injection — "
            "multiply the effective dataset size and teach invariances the "
            "task demands. Augmentation strength trades off: aggressive "
            "policies regularize large models but can destroy the signal "
            "small models need.",
            # p5 input pipeline
            "INPUT PIPELINES\n"
            "Accelerators starve when preprocessing runs on demand. "
            "Pipelines decode, transform, and batch examples on background "
            "workers, prefetching several batches ahead so device steps "
            "never wait on the host. Shuffling draws from a buffer much "
            "larger than a batch to approximate a global permutation of the "
            "epoch.",
        ],
    },
    {
        "doc": "gpu_programming.pdf",
        "category": "systems",
        "pages": [
            # p1 execution model
            "KERNEL EXECUTION MODEL\n"
            "A device kernel launches thousands of threads organized into "
            "blocks; threads within a block cooperate through fast on-chip "
            "memory and barriers, while blocks are scheduled independently "
            "across the chip's cores. The hardware executes threads in "
            "fixed-width groups in lockstep, so divergent branches within a "
            "group serialize both paths.",
            # p2 coalescing
            "MEMORY COALESCING\n"
            "Global memory delivers full bandwidth only when the threads of "
            "a group access consecutive addresses, letting the hardware "
            "merge their loads into a few wide transactions. Strided or "
            "scattered access patterns split into many narrow transactions "
            "and can cut effective bandwidth by an order of magnitude. "
            "Layout transformations often pay for themselves immediately.",
            # p3 tiling
            "SHARED MEMORY TILING\n"
            "Kernels that reuse operands, such as matrix multiplication, "
            "stage tiles of the inputs in on-chip scratch memory so each "
            "element loaded from global memory is consumed many times. Tile "
            "size balances reuse against the occupancy cost of scratch "
            "allocation, and padding avoids pathological bank conflicts when "
            "threads access the same scratch column.",
            # p4 occupancy
            "OCCUPANCY AND LATENCY HIDING\n"
            "The chip hides memory latency by keeping many thread groups "
            "resident and switching among them whenever one stalls. "
            "Registers and scratch memory per thread bound how many groups "
            "fit, so spilling a few registers can paradoxically speed a "
            "kernel up by raising residency. Profilers report achieved "
            "occupancy against the hardware ceiling.",
            # p5 streams
            "STREAMS AND OVERLAP\n"
            "Independent operations issued on separate streams may execute "
            "concurrently: compute on one stream overlaps host-device "
            "transfers on another. Events record completion points for "
            "cross-stream ordering without global barriers. Pinned host "
            "buffers make transfers asynchronous; pageable memory forces a "
            "hidden staging copy.",
        ],
    },
    {
        "doc": "memory_management.pdf",
        "category": "systems",
        "pages": [
            # p1 pools (TRAP "pool" with connection pooling / pooling layers)
            "ALLOCATION POOLS\n"
            "A pool allocator carves a large reserved region into fixed-size "
            "slots and serves requests by popping a free slot, making "
            "allocation and release constant-time pointer operations. Pools "
            "eliminate per-object header overhead and suit workloads that "
            "churn many same-sized objects, at the cost of internal "
            "fragmentation when object sizes vary.",
            # p2 fragmentation
            "FRAGMENTATION\n"
            "After many allocations and frees of mixed sizes, free memory "
            "splinters into gaps too small to serve new requests even though "
            "their total would suffice. Compaction relocates live objects to "
            "close the gaps but requires updating every reference. Size-"
            "class segregation and slab designs prevent most fragmentation "
            "by never mixing sizes within a region.",
            # p3 refcounting
            "REFERENCE COUNTING\n"
            "Every object carries a counter of incoming references; "
            "assignments increment it and scope exits decrement it, and the "
            "object is reclaimed the instant the count reaches zero. "
            "Reclamation is prompt and spread evenly through execution, but "
            "reference cycles never reach zero and need a separate cycle "
            "detector, and counter updates contend under multithreading.",
            # p4 tracing gc
            "TRACING COLLECTION\n"
            "A tracing collector starts from roots — stacks, globals, "
            "registers — and marks every reachable object; unmarked memory "
            "is swept or evacuated. Generational designs exploit the "
            "observation that most objects die young by collecting a small "
            "nursery frequently and promoting survivors, shrinking pause "
            "times dramatically.",
            # p5 arenas
            "ARENA ALLOCATION\n"
            "An arena ties object lifetimes to a phase of the program: "
            "allocations bump a pointer through a contiguous block, and the "
            "whole arena is released in one operation when the phase ends. "
            "Parsers and request handlers use arenas to make thousands of "
            "small allocations effectively free and to guarantee no leaks "
            "survive the request.",
        ],
    },
    {
        "doc": "database_internals.pdf",
        "category": "databases",
        "pages": [
            # p1 btree (TRAP "index")
            "B-TREE INDEXES\n"
            "A B-tree index keeps keys sorted in wide shallow nodes sized to "
            "disk pages, so point lookups touch only a handful of pages and "
            "range scans walk the leaves sequentially. Inserts split full "
            "nodes and splits can cascade upward, which is why write-heavy "
            "tables pay for every secondary index they maintain.",
            # p2 WAL + checkpoint (TRAP "checkpoint")
            "WRITE-AHEAD LOGGING\n"
            "Every modification is appended to a sequential log and must "
            "reach durable storage before the corresponding data page may be "
            "rewritten in place. Recovery replays the log from the last "
            "checkpoint — the point at which all earlier changes were known "
            "to be flushed — so crash consistency costs one sequential "
            "write instead of random page flushes at commit time.",
            # p3 planner
            "QUERY PLANNING\n"
            "The planner enumerates candidate execution strategies — scan "
            "orders, join algorithms, index choices — and costs them with "
            "statistics about table sizes and value distributions. Stale "
            "statistics produce wildly wrong row estimates and thus "
            "catastrophic plans, so collection runs automatically after "
            "significant data change.",
            # p4 mvcc
            "MULTI-VERSION CONCURRENCY\n"
            "Writers never block readers: an update creates a new row "
            "version stamped with the writing transaction, and each reader "
            "sees the newest version visible at its snapshot. Old versions "
            "accumulate until no live snapshot can see them, at which point "
            "a background vacuum reclaims their space.",
            # p5 vacuum/compaction (TRAP "compaction")
            "SPACE RECLAMATION\n"
            "Deleted and superseded row versions leave dead space inside "
            "data pages. Routine vacuuming marks that space reusable for "
            "future inserts without shrinking files, while full compaction "
            "rewrites a table to return space to the filesystem at the cost "
            "of an exclusive lock. Monitoring dead-tuple ratios decides "
            "which to schedule.",
        ],
    },
    {
        "doc": "networking_guide.pdf",
        "category": "systems",
        "pages": [
            # p1 congestion
            "CONGESTION CONTROL\n"
            "A sender probes for available bandwidth by growing its window "
            "of unacknowledged data until loss or delay signals congestion, "
            "then backs off multiplicatively. Slow start doubles the window "
            "each round trip from a conservative base; afterwards growth is "
            "linear. Modern algorithms model queue delay to keep buffers "
            "shallow rather than waiting for drops.",
            # p2 retries
            "RETRIES AND BACKOFF\n"
            "Failed requests are retried with exponentially increasing "
            "delays plus random jitter so that a herd of clients does not "
            "resynchronize and hammer a recovering service. Retries are "
            "only safe for idempotent operations; others need deduplication "
            "tokens. A retry budget caps the amplification a failing "
            "dependency can inflict downstream.",
            # p3 connection pooling (TRAP "pool")
            "CONNECTION POOLING\n"
            "Establishing a connection costs round trips for the transport "
            "and cryptographic handshakes, so clients keep a pool of warm "
            "connections and lease one per request. Pools enforce a maximum "
            "size to protect the server, evict idle members before the peer "
            "times them out, and validate leased connections cheaply to "
            "avoid handing out dead ones.",
            # p4 load balancing
            "LOAD BALANCING\n"
            "A balancer spreads requests across replicas using strategies "
            "from round robin to least-outstanding-requests, which adapts "
            "automatically to slow instances. Consistent hashing pins a key "
            "to a replica so caches stay warm, while health checks eject "
            "failing backends from rotation before clients notice.",
            # p5 tls
            "SECURE TRANSPORT HANDSHAKE\n"
            "The handshake authenticates the server through a certificate "
            "chain ending at a trusted root and negotiates symmetric keys "
            "via an ephemeral key exchange, giving forward secrecy: a "
            "compromised long-term key cannot decrypt recorded sessions. "
            "Session resumption skips the full exchange on reconnect, "
            "saving a round trip.",
        ],
    },
    {
        "doc": "text_processing.pdf",
        "category": "nlp",
        "pages": [
            # p1 tokenization
            "SUBWORD TOKENIZATION\n"
            "Fixed vocabularies cannot cover open-ended text, so modern "
            "tokenizers learn a vocabulary of frequent character sequences "
            "and spell rare words as several pieces. Training greedily "
            "merges the most frequent adjacent pairs until the target "
            "vocabulary size is reached. Every string remains encodable "
            "because single characters stay in the vocabulary as a floor.",
            # p2 stemming
            "STEMMING AND LEMMATIZATION\n"
            "Stemmers chop suffixes by rule to collapse inflected forms "
            "onto a shared stem, fast but occasionally merging unrelated "
            "words or producing non-words. Lemmatizers look morphology up "
            "against a dictionary and part-of-speech context to return the "
            "true base form, at higher cost. Retrieval systems usually "
            "accept the stemmer's errors for its speed.",
            # p3 ngrams
            "N-GRAM MODELS\n"
            "An n-gram model estimates the probability of a token from the "
            "preceding n-minus-one tokens using corpus counts. Because most "
            "long contexts never occur in training data, smoothing "
            "redistributes probability mass to unseen events and backoff "
            "falls back to shorter contexts. Perplexity measures how well "
            "the model predicts held-out text.",
            # p4 regex
            "REGULAR EXPRESSION ENGINES\n"
            "Backtracking engines try alternatives recursively and support "
            "rich features, but crafted inputs can trigger exponential "
            "blowup — a denial-of-service vector. Automata-based engines "
            "compile the pattern to a state machine that scans input in "
            "linear time regardless of pattern complexity, at the price of "
            "dropping backreferences.",
            # p5 unicode
            "UNICODE NORMALIZATION\n"
            "The same visible character can be encoded multiple ways — a "
            "precomposed accented letter or a base letter plus combining "
            "mark — so byte-level comparison misses equal strings. "
            "Normalization rewrites text to a canonical form before "
            "comparison or hashing. Case folding goes further than "
            "lowercasing, mapping characters across scripts for caseless "
            "matching.",
        ],
    },
    {
        "doc": "search_engines.pdf",
        "category": "retrieval",
        "pages": [
            # p1 inverted index (TRAP "index")
            "INVERTED INDEXES\n"
            "An inverted index maps each term to the sorted list of "
            "documents containing it, so a query touches only the postings "
            "of its terms instead of scanning the corpus. Intersection of "
            "sorted postings answers conjunctive queries; skip pointers "
            "and galloping search accelerate the merge. Positional postings "
            "additionally support phrase queries.",
            # p2 ranking
            "TERM-WEIGHTED RANKING\n"
            "Classical ranking scores a document by summing, per query "
            "term, a weight that grows with the term's frequency in the "
            "document but saturates, is discounted for ubiquitous terms, "
            "and is normalized by document length so long documents do not "
            "win by volume alone. Tuning the saturation and length "
            "parameters adapts the formula to a corpus.",
            # p3 crawling
            "CRAWL SCHEDULING\n"
            "A crawler maintains a frontier of discovered links prioritized "
            "by expected value and staleness, fetching politely under per-"
            "host rate limits. Duplicate detection canonicalizes addresses "
            "and fingerprints page content, since mirror sites and session "
            "parameters otherwise flood the index with near-identical "
            "entries.",
            # p4 snippets
            "RESULT SNIPPETS\n"
            "For each hit the engine selects a window of the document that "
            "covers as many query terms as possible, preferring sentence "
            "boundaries, and highlights the matches. Good snippets let "
            "users judge relevance without clicking; they are generated at "
            "query time from a stored forward copy of the text.",
            # p5 query expansion
            "QUERY EXPANSION\n"
            "Short queries miss relevant documents that use different "
            "words. Expansion adds related terms from synonym resources or "
            "from the top-ranked results of a first pass — pseudo-relevance "
            "feedback — then reruns the search. Expansion raises recall "
            "but risks drift when the added terms change the query's "
            "meaning.",
        ],
    },
    {
        "doc": "neural_networks.pdf",
        "category": "ml_theory",
        "pages": [
            # p1 backprop
            "BACKPROPAGATION\n"
            "The chain rule applied backwards through the computation graph "
            "yields the gradient of the loss with respect to every "
            "parameter in one reverse sweep, reusing the forward pass's "
            "intermediate activations. Its cost is a small constant times "
            "the forward cost, which is what makes training deep "
            "compositions feasible at all.",
            # p2 attention
            "ATTENTION MECHANISMS\n"
            "Attention lets each position of a sequence gather information "
            "from every other position with weights computed from learned "
            "similarity between queries and keys. The weighted sum of "
            "values replaces recurrence entirely, enabling full "
            "parallelism over the sequence during training at quadratic "
            "cost in its length.",
            # p3 convolution (TRAP "convolution")
            "CONVOLUTIONAL LAYERS\n"
            "A convolutional layer slides small learned filters across the "
            "input, sharing the same weights at every spatial position. "
            "Weight sharing encodes translation equivariance and cuts "
            "parameters by orders of magnitude compared to dense "
            "connections. Stacking layers grows the receptive field so "
            "late layers see global context. Pooling stages summarize "
            "neighborhoods to buy small translation invariance.",
            # p4 regularization
            "DROPOUT AND REGULARIZATION\n"
            "Dropout zeroes a random subset of activations each training "
            "step, preventing units from co-adapting and approximating an "
            "ensemble of subnetworks; at inference the full network runs "
            "with scaled activations. Weight decay shrinks parameters "
            "toward zero every update, bounding model complexity "
            "independently of the data.",
            # p5 embeddings
            "LEARNED EMBEDDINGS\n"
            "Discrete symbols enter a network through an embedding table: "
            "a learned vector per symbol, trained end-to-end so that "
            "symbols playing similar roles drift close together in the "
            "vector space. Distances in that space then support analogy "
            "and similarity search, and pretrained tables transfer across "
            "tasks.",
        ],
    },
    {
        "doc": "probability_primer.pdf",
        "category": "statistics",
        "pages": [
            # p1 bayes
            "BAYESIAN UPDATING\n"
            "A prior belief over hypotheses is revised by evidence through "
            "the likelihood: the posterior is proportional to prior times "
            "likelihood. The denominator — the marginal probability of the "
            "evidence — normalizes the result. Base-rate neglect, ignoring "
            "the prior when the likelihood is vivid, is the canonical "
            "reasoning error the formula corrects.",
            # p2 distributions
            "COMMON DISTRIBUTIONS\n"
            "Counts of rare independent events follow a Poisson law; "
            "waiting times between them are exponential. Sums of many "
            "small independent effects approach the normal distribution "
            "regardless of their individual shapes — the central limit "
            "theorem — which is why the bell curve appears everywhere "
            "measurement noise accumulates.",
            # p3 mcmc
            "MARKOV CHAIN SAMPLING\n"
            "When a posterior cannot be integrated analytically, a Markov "
            "chain is constructed whose stationary distribution is the "
            "posterior; simulating it long enough yields dependent but "
            "valid samples. Proposals are accepted or rejected by a ratio "
            "that needs the density only up to a constant. Burn-in is "
            "discarded and mixing is diagnosed with multiple chains.",
            # p4 testing
            "HYPOTHESIS TESTING\n"
            "A test controls the rate of false alarms: assuming the null "
            "hypothesis, the p-value is the probability of data at least "
            "as extreme as observed. Rejecting below a threshold bounds "
            "type-one error, while power — the chance of detecting a real "
            "effect — depends on sample size and effect magnitude. "
            "Multiple comparisons inflate false alarms without correction.",
            # p5 intervals
            "CONFIDENCE INTERVALS\n"
            "An interval procedure traps the true parameter in a stated "
            "fraction of repeated experiments; any single interval either "
            "contains it or not. Width shrinks with the square root of the "
            "sample size, so halving uncertainty costs quadruple the data. "
            "Bootstrap resampling estimates intervals when no closed form "
            "exists.",
        ],
    },
    {
        "doc": "linear_algebra.pdf",
        "category": "numerics",
        "pages": [
            # p1 decompositions
            "MATRIX DECOMPOSITIONS\n"
            "Factoring a matrix exposes structure: triangular factors turn "
            "solving into cheap substitution sweeps, orthogonal factors "
            "isolate rotations from scaling, and the singular value "
            "decomposition orders the directions along which a linear map "
            "stretches space. Choosing the factorization that matches the "
            "problem is most of numerical linear algebra.",
            # p2 eigen
            "EIGENVALUES IN PRACTICE\n"
            "Eigenvectors are the directions a transformation merely "
            "scales, and the dominant one emerges from simply applying the "
            "matrix repeatedly to a random vector and renormalizing — the "
            "power iteration. Spectral analysis of graph matrices reveals "
            "clusters and ranks nodes; stability of dynamical systems "
            "hinges on whether any eigenvalue magnitude exceeds one.",
            # p3 sparse
            "SPARSE MATRICES\n"
            "Systems from graphs and discretized physics are overwhelmingly "
            "zero, so compressed formats store only the nonzero entries "
            "with their coordinates. Iterative solvers built on repeated "
            "matrix-vector products exploit this, converging in few "
            "iterations when preconditioned, whereas direct factorization "
            "suffers fill-in that destroys the sparsity.",
            # p4 conditioning
            "CONDITIONING AND STABILITY\n"
            "The condition number bounds how much a relative input "
            "perturbation can amplify in the output, independent of any "
            "algorithm. A stable algorithm adds no more error than the "
            "conditioning already permits; an unstable one can lose all "
            "digits on a well-conditioned problem. Normal equations square "
            "the condition number, which is why orthogonal methods are "
            "preferred for least squares.",
            # p5 least squares
            "LEAST SQUARES FITTING\n"
            "Overdetermined systems have no exact solution; least squares "
            "picks the parameters minimizing the sum of squared residuals, "
            "equivalently projecting the observation vector onto the span "
            "of the predictors. Regularization adds a penalty that shrinks "
            "coefficients, trading a little bias for much lower variance "
            "when predictors are nearly collinear.",
        ],
    },
    {
        "doc": "signal_processing.pdf",
        "category": "dsp",
        "pages": [
            # p1 fft
            "THE FAST FOURIER TRANSFORM\n"
            "The discrete Fourier transform rewrites a signal as a sum of "
            "sinusoids; computing it naively costs quadratic time, but a "
            "divide-and-conquer factorization reuses shared subproblems to "
            "finish in n log n operations. That speedup turned spectral "
            "analysis from a luxury into the default representation for "
            "audio, radio, and imaging.",
            # p2 sampling
            "SAMPLING AND ALIASING\n"
            "A continuous signal is perfectly recoverable from samples "
            "taken at more than twice its highest frequency. Below that "
            "rate, high frequencies fold back and masquerade as low ones — "
            "aliasing — indistinguishable after the fact. Anti-aliasing "
            "filters must therefore remove ultrasonic content before "
            "digitization, not after.",
            # p3 filters
            "DIGITAL FILTERS\n"
            "Finite-impulse-response filters combine a sliding window of "
            "recent samples with fixed coefficients; they are "
            "unconditionally stable and can have exactly linear phase, "
            "which preserves waveform shape. Recursive filters feed "
            "outputs back, achieving sharp responses with few "
            "coefficients but risking instability and phase distortion.",
            # p4 convolution theorem (TRAP "convolution")
            "THE CONVOLUTION THEOREM\n"
            "Convolution in the time domain equals pointwise "
            "multiplication in the frequency domain. Long convolutions "
            "therefore run faster by transforming both signals, "
            "multiplying their spectra, and transforming back — the "
            "foundation of fast filtering, correlation, and polynomial "
            "multiplication beyond a few hundred taps.",
            # p5 windowing
            "SPECTRAL LEAKAGE AND WINDOWS\n"
            "Analyzing a finite slice of a signal implicitly multiplies it "
            "by a rectangle, smearing each true frequency across neighbors "
            "— leakage. Tapered windows trade a wider main lobe for far "
            "lower sidelobes, letting weak tones survive next to strong "
            "ones. The window choice is a resolution-versus-dynamic-range "
            "bargain.",
        ],
    },
    {
        "doc": "compilers_handbook.pdf",
        "category": "systems",
        "pages": [
            # p1 parsing
            "PARSING AND SYNTAX TREES\n"
            "A parser turns a token stream into a tree reflecting the "
            "grammar's structure. Recursive-descent parsers mirror the "
            "grammar in code and give precise error messages; table-driven "
            "parsers are generated from declarative grammars. Operator "
            "precedence is handled either by grammar stratification or by "
            "climbing precedence levels during descent.",
            # p2 ssa
            "STATIC SINGLE ASSIGNMENT\n"
            "Rewriting the program so every variable is assigned exactly "
            "once, with join points selecting among versions, makes "
            "def-use chains explicit. Constant propagation, dead-code "
            "elimination, and value numbering all become simple worklist "
            "passes over this form, which is why virtually every modern "
            "optimizer is built on it.",
            # p3 regalloc
            "REGISTER ALLOCATION\n"
            "Variables live simultaneously cannot share a register; the "
            "allocator colors an interference graph with the machine's "
            "register set and spills the least valuable values to stack "
            "slots when colors run out. Live-range splitting shortens "
            "interference, often converting a spill into a cheap move.",
            # p4 jit
            "JUST-IN-TIME COMPILATION\n"
            "A tiered runtime interprets cold code, counts executions, and "
            "compiles hot paths with aggressive speculation based on "
            "observed types and branches. Guards validate each speculation "
            "and deoptimize back to the interpreter when reality diverges, "
            "reconstructing interpreter state from a side table.",
            # p5 inlining
            "INLINING\n"
            "Replacing a call with the callee's body removes call overhead "
            "and, more importantly, exposes the caller's constants and "
            "context to every downstream optimization. Overdone, it bloats "
            "code and thrashes the instruction cache, so heuristics weigh "
            "callee size, call-site hotness, and the optimization "
            "opportunities unlocked.",
        ],
    },
    {
        "doc": "concurrency_patterns.pdf",
        "category": "systems",
        "pages": [
            # p1 locks
            "LOCKS AND DEADLOCK\n"
            "Mutual exclusion serializes access to shared state, but two "
            "threads acquiring two locks in opposite orders can wait on "
            "each other forever. Deadlock needs four simultaneous "
            "conditions, and breaking any one suffices — most systems "
            "impose a global lock acquisition order. Contended locks also "
            "convoy: threads queue and throughput collapses.",
            # p2 atomics
            "LOCK-FREE PRIMITIVES\n"
            "Compare-and-swap installs a new value only if the location "
            "still holds the expected old one, letting threads retry "
            "optimistically instead of blocking. Progress is guaranteed "
            "system-wide though individual threads may starve. The ABA "
            "hazard — a value changing and changing back between read and "
            "swap — is defused with version counters.",
            # p3 event loops
            "ASYNCHRONOUS EVENT LOOPS\n"
            "A single thread multiplexes thousands of connections by "
            "registering interest in readiness events and running small "
            "non-blocking callbacks as they fire. Any accidental blocking "
            "call stalls every task on the loop, so slow work is shipped "
            "to worker threads and rejoined through completion events.",
            # p4 work stealing
            "WORK-STEALING SCHEDULERS\n"
            "Each worker owns a double-ended task queue, pushing and "
            "popping at one end without synchronization; idle workers "
            "steal from the opposite end of a random victim's queue. "
            "Stealing oldest tasks first grabs the largest pending "
            "subtrees, amortizing the theft and keeping caches warm for "
            "the owner's recent work.",
            # p5 message passing
            "MESSAGE PASSING\n"
            "Sharing memory by communicating replaces locks with channels: "
            "ownership of data transfers with the message, so no two "
            "threads mutate it concurrently. Bounded channels provide "
            "backpressure — a fast producer blocks rather than exhausting "
            "memory. Deadlocks remain possible through cyclic channel "
            "waits.",
        ],
    },
    {
        "doc": "storage_systems.pdf",
        "category": "databases",
        "pages": [
            # p1 lsm (TRAP "compaction")
            "LOG-STRUCTURED MERGE TREES\n"
            "Writes land in an in-memory table and flush to immutable "
            "sorted files, turning random writes into sequential ones. "
            "Background compaction merges overlapping files into larger "
            "sorted runs to bound read amplification. Reads consult a "
            "per-file Bloom filter to skip files that cannot contain the "
            "key, keeping point lookups cheap despite many files.",
            # p2 replication
            "REPLICATED CONSENSUS\n"
            "A leader sequences updates and replicates them to followers; "
            "an entry commits once a majority acknowledges it, so any two "
            "majorities overlap and no committed write can be lost by a "
            "single failure. Elections with randomized timeouts replace a "
            "failed leader, and stale leaders are fenced by term numbers.",
            # p3 erasure coding
            "ERASURE CODING\n"
            "Replication triples storage cost; coding instead stripes data "
            "into k fragments plus m parity fragments such that any k of "
            "the k plus m reconstruct the object. Durability matches or "
            "exceeds replication at a fraction of the overhead, paid for "
            "with reconstruction traffic and latency when fragments are "
            "lost or slow.",
            # p4 cache tiers (TRAP "cache")
            "CACHING TIERS\n"
            "Hot objects are served from memory tiers in front of slower "
            "durable storage, with admission and eviction policies tuned "
            "to the skew of access. Negative caching remembers misses so "
            "repeated lookups for absent keys do not hammer the backing "
            "store, and stampede protection collapses concurrent fills of "
            "the same key into one.",
            # p5 tiering/compaction strategies
            "COMPACTION STRATEGIES\n"
            "Leveled compaction keeps each level an order of magnitude "
            "larger than the last with non-overlapping files, minimizing "
            "space and read cost at higher write amplification. Size-"
            "tiered compaction merges similar-sized runs, cheaper to "
            "write but costlier to read and reclaim. Workload shape — "
            "write-heavy versus scan-heavy — decides the strategy.",
        ],
    },
    {
        "doc": "image_processing.pdf",
        "category": "vision",
        "pages": [
            # p1 filters (TRAP "convolution")
            "SPATIAL FILTERING\n"
            "Sliding a small kernel over an image and summing weighted "
            "neighborhoods implements blurring, sharpening, and edge "
            "detection with one mechanism. Gaussian kernels smooth noise "
            "while preserving large structures; derivative kernels respond "
            "to intensity transitions, and their magnitude across "
            "orientations localizes edges.",
            # p2 color
            "COLOR SPACES\n"
            "Device color mixes red, green, and blue primaries, but "
            "perceptual tasks prefer spaces separating luminance from "
            "chromaticity: compression allocates fewer bits to color "
            "detail the eye cannot resolve, and lighting changes move "
            "pixels mostly along the luminance axis, simplifying "
            "invariant features.",
            # p3 resampling
            "RESAMPLING AND INTERPOLATION\n"
            "Scaling an image maps output pixels to fractional input "
            "coordinates whose values must be interpolated. Nearest-"
            "neighbor preserves hard edges but staircases diagonals; "
            "bilinear smooths cheaply; bicubic weighs a wider neighborhood "
            "for crisper results. Downscaling must prefilter, or fine "
            "patterns alias into moire artifacts.",
            # p4 histogram
            "HISTOGRAM EQUALIZATION\n"
            "Remapping intensities so their cumulative distribution "
            "becomes uniform spreads a compressed tonal range across the "
            "full scale, reviving detail in murky images. Adaptive "
            "variants equalize local tiles with interpolation between "
            "them, and a contrast limit prevents noise in flat regions "
            "from being amplified into texture.",
            # p5 compression
            "LOSSY IMAGE COMPRESSION\n"
            "Transform coding concentrates image energy into few "
            "coefficients, quantizes them coarsely according to "
            "perceptual importance, and entropy-codes the result. "
            "Quantization is the lossy step: discarded precision in high-"
            "frequency coefficients is invisible at normal viewing "
            "distances but ruins later heavy editing.",
        ],
    },
]

# 45 retrieval queries. Fields: query, doc, page (1-based), difficulty,
# gist. Difficulty: easy = shares content words with the gold passage;
# medium = paraphrase, minimal lexical overlap; hard = paraphrase plus trap
# keywords that lexically point at OTHER documents.
QUERIES = [
    # arrays_guide
    ("How are two differently shaped arrays combined without copying data?",
     "arrays_guide.pdf", 1, "easy",
     "size-one dims stretch with zero stride; checked from trailing dims"),
    ("Why did modifying my slice also change the original array?",
     "arrays_guide.pdf", 2, "medium",
     "basic slicing returns a view sharing the parent buffer"),
    ("Why is looping over the last axis so much quicker than the first?",
     "arrays_guide.pdf", 4, "medium",
     "contiguous axis traversal hits the same cache lines"),

    # dataframe_handbook
    ("After pairing up records from two datasets, I got far more records out than I put in — why?",
     "dataframe_handbook.pdf", 1, "medium",
     "duplicate keys produce cartesian products of matching groups"),
    ("Ways to fill in gaps in my observations before modeling?",
     "dataframe_handbook.pdf", 3, "medium",
     "forward fill, median substitution, or dropping incomplete rows"),
    ("How do I convert a per-minute series into hourly totals?",
     "dataframe_handbook.pdf", 4, "medium",
     "downsampling buckets timestamps and aggregates each window"),

    # optimizer_manual
    ("Why divide each parameter's step by a running magnitude estimate?",
     "optimizer_manual.pdf", 2, "medium",
     "adaptive methods equalize progress across differently scaled params"),
    ("What's the point of ramping the step size up from zero at the start?",
     "optimizer_manual.pdf", 3, "medium",
     "warmup protects a randomly initialized model from destabilization"),
    ("One huge rogue update wrecked my whole run — how do people prevent that?",
     "optimizer_manual.pdf", 4, "hard",
     "global-norm clipping bounds step length, preserves direction"),

    # training_pipeline (checkpoint trap: database WAL also has checkpoints)
    ("How should a trainer save its state so a crash can't corrupt the snapshot?",
     "training_pipeline.pdf", 1, "hard",
     "write temp file then rename; resume from last valid snapshot"),
    ("My validation score got worse while training loss kept improving — what now?",
     "training_pipeline.pdf", 2, "medium",
     "early stopping with patience; restore best weights"),
    ("Why multiply the loss by a big constant when computing half-precision gradients?",
     "training_pipeline.pdf", 3, "medium",
     "loss scaling lifts small gradients above the representable floor"),

    # gpu_programming
    ("Why do branchy kernels run at half speed on the device?",
     "gpu_programming.pdf", 1, "medium",
     "lockstep thread groups serialize divergent branches"),
    ("What access pattern lets the hardware merge thread loads into wide transactions?",
     "gpu_programming.pdf", 2, "easy",
     "consecutive addresses across the thread group coalesce"),
    ("Can spilling registers ever make a kernel faster?",
     "gpu_programming.pdf", 4, "medium",
     "fewer registers per thread raises resident groups, hiding latency"),

    # memory_management (pool trap: networking connection pool)
    ("What makes slot-based allocators constant time for same-sized objects?",
     "memory_management.pdf", 1, "medium",
     "pools pop fixed-size slots from a reserved region"),
    ("Free memory totals enough but allocations still fail — what's happening?",
     "memory_management.pdf", 2, "medium",
     "fragmentation: gaps too small to serve requests"),
    ("A parser makes thousands of tiny allocations per request — cheapest strategy to free them all?",
     "memory_management.pdf", 5, "medium",
     "arena: bump-pointer allocation, release whole region at phase end"),

    # database_internals (index trap, checkpoint trap, compaction trap)
    ("Why does every extra secondary index slow down my inserts?",
     "database_internals.pdf", 1, "medium",
     "B-tree maintenance: node splits on every indexed write"),
    ("What lets a transaction become permanent with one append-only write instead of scattering updates across the disk?",
     "database_internals.pdf", 2, "hard",
     "write-ahead log; recovery replays from the last checkpoint"),
    ("The planner suddenly picked a terrible strategy after a bulk load — why?",
     "database_internals.pdf", 3, "medium",
     "stale statistics produce wrong row estimates"),
    ("How do readers see a consistent snapshot while writers keep updating rows?",
     "database_internals.pdf", 4, "easy",
     "multi-version concurrency: versions stamped per transaction"),

    # networking_guide (pool trap)
    ("How does a sender figure out how fast it can push data without swamping the path?",
     "networking_guide.pdf", 1, "medium",
     "window growth probing with multiplicative backoff on congestion"),
    ("Why reuse existing network sessions instead of setting up a fresh one for every call?",
     "networking_guide.pdf", 3, "hard",
     "pooling avoids transport+crypto handshake round trips"),
    ("Why is tomorrow's key theft useless against yesterday's captured traffic?",
     "networking_guide.pdf", 5, "medium",
     "forward secrecy via ephemeral key exchange"),

    # text_processing
    ("How do tokenizers handle words they've never seen before?",
     "text_processing.pdf", 1, "easy",
     "rare words spelled as multiple subword pieces; chars as floor"),
    ("Why can a crafted string make some pattern matchers hang for minutes?",
     "text_processing.pdf", 4, "medium",
     "backtracking engines blow up exponentially; automata stay linear"),
    ("Two strings look identical on screen but compare unequal — what gives?",
     "text_processing.pdf", 5, "medium",
     "multiple encodings of same character; normalize before comparing"),

    # search_engines (index trap)
    ("How does full-text lookup touch only a tiny fraction of the collection per request?",
     "search_engines.pdf", 1, "hard",
     "inverted index: per-term postings lists, merge intersections"),
    ("What stops verbose pages from winning results just by repeating everything?",
     "search_engines.pdf", 2, "medium",
     "term weight saturates and is length-normalized"),
    ("How can an engine quietly borrow vocabulary from its own best matches to retry a vague request?",
     "search_engines.pdf", 5, "medium",
     "pseudo-relevance feedback adds terms from top results, reruns"),

    # neural_networks (convolution trap)
    ("Why is finding how the error changes with every weight only a constant factor costlier than evaluating the model once?",
     "neural_networks.pdf", 1, "medium",
     "reverse sweep reuses activations; constant factor of forward cost"),
    ("What mechanism lets any element of an input directly pull from all the others, and how does its cost grow?",
     "neural_networks.pdf", 2, "medium",
     "attention weighted sums; quadratic in sequence length"),
    ("Why do image models reuse one small detector at every location instead of learning separate connections per pixel?",
     "neural_networks.pdf", 3, "hard",
     "translation equivariance and massive parameter reduction"),
    ("Why randomly silence units during training but not at test time?",
     "neural_networks.pdf", 4, "easy",
     "dropout prevents co-adaptation, approximates an ensemble"),

    # probability_primer
    ("A test came back positive for a rare condition — why isn't it probably true?",
     "probability_primer.pdf", 1, "medium",
     "base rates: posterior proportional to prior times likelihood"),
    ("How can you draw samples from a distribution you can only evaluate up to a constant?",
     "probability_primer.pdf", 3, "medium",
     "MCMC: acceptance ratio needs unnormalized density only"),

    # linear_algebra
    ("Why do people avoid forming the normal equations when fitting overdetermined systems?",
     "linear_algebra.pdf", 4, "hard",
     "normal equations square the condition number; use orthogonal methods"),
    ("My matrix is mostly zeros — how should I store and solve with it?",
     "linear_algebra.pdf", 3, "medium",
     "compressed sparse formats + iterative matrix-vector solvers"),

    # signal_processing (convolution trap lives here too)
    ("I sampled too slowly and now high tones show up as low ones — can I fix it afterwards?",
     "signal_processing.pdf", 2, "medium",
     "aliasing is unrecoverable; filter before digitization"),
    ("For very long smoothing windows, why transform to another representation, combine there, and come back?",
     "signal_processing.pdf", 4, "hard",
     "convolution theorem: transform, multiply pointwise, invert"),

    # compilers_handbook
    ("How do runtimes make dynamic code fast while staying correct when assumptions break?",
     "compilers_handbook.pdf", 4, "medium",
     "tiered JIT with speculation guards and deoptimization"),

    # concurrency_patterns
    ("How do idle workers find tasks without a central queue bottleneck?",
     "concurrency_patterns.pdf", 4, "medium",
     "work stealing from the far end of a random victim's deque"),

    # storage_systems
    ("My database optimized for fast ingestion spends half its time reorganizing old data — why is that necessary?",
     "storage_systems.pdf", 1, "hard",
     "LSM compaction bounds read amplification across sorted runs"),

    # image_processing
    ("An underexposed picture looks flat and gray — what remapping spreads its values across the whole scale?",
     "image_processing.pdf", 4, "medium",
     "histogram equalization; adaptive tiles with contrast limiting"),
]

# Rejection queries: nothing in the corpus answers these.
REJECTION_QUERIES = [
    "What year did the Treaty of Westphalia end the Thirty Years' War?",
    "Recommended marinade time for grilled octopus before searing?",
    "Which constellation contains the star Betelgeuse?",
    "What is the average rainfall in the Amazon basin during March?",
    "Who composed the opera The Magic Flute and when did it premiere?",
]

assert len(QUERIES) == 45, len(QUERIES)
assert len(REJECTION_QUERIES) == 5
assert len(DOCS) == 18 and all(len(d["pages"]) == 5 for d in DOCS)

# ---- round-3 extension (corpus_data_v3.py): 13 more documents, 108 more
# retrieval queries, 10 more rejection queries — takes the dev split to
# 153 retrieval + 15 rejection so one query is worth <= 0.0065 hit rate
# (VERDICT r2 weak #4: 45 queries put adoption decisions inside noise).
from eval_harness.corpus_data_v3 import (  # noqa: E402
    DOCS_V3,
    QUERIES_V3,
    REJECTION_QUERIES_V3,
)

DOCS = DOCS + DOCS_V3
QUERIES = QUERIES + QUERIES_V3
REJECTION_QUERIES = REJECTION_QUERIES + REJECTION_QUERIES_V3

assert len(QUERIES) == 153, len(QUERIES)
assert len(REJECTION_QUERIES) == 15
assert len(DOCS) == 31 and all(len(d["pages"]) == 5 for d in DOCS)
_names = [d["doc"] for d in DOCS]
assert len(set(_names)) == len(_names)
for _q in QUERIES:
    assert _q[1] in _names and 1 <= _q[2] <= 5, _q
