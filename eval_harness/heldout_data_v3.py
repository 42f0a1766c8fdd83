"""Round-3 extension of the HELD-OUT test split: +112 retrieval and +10
rejection queries, taking it to 157 retrieval + 15 rejection (matching the
extended dev split's granularity; VERDICT r2 weak #4).

Hygiene contract (same as heldout_data.py): authored once, report-only,
never consulted by sweeps or adoption decisions. Each query targets a
DIFFERENT fact than the dev split asks about the same page, and no query
text is shared with any other split. Rejection queries are fresh classes
— NOT drawn from training/ood.py's synthesized junk banks (which are
mechanism-informed for the committed judge — advisor r2 note) and not
overlapping the dev split's rejection topics.
"""

HELDOUT_QUERIES_V3 = [
    # ---- version_control.pdf ----
    ("Reviewing my uncommitted work, which diff actually tells me what "
     "the next snapshot will contain?",
     "version_control.pdf", 1, "medium",
     "the staged diff, not the working diff"),
    ("Two people edited the same lines on different branches — what "
     "appears when their work is combined?",
     "version_control.pdf", 2, "easy",
     "conflict markers requiring manual resolution"),
    ("Why does replaying commits onto a new base change their identifiers "
     "even though the code changes are identical?",
     "version_control.pdf", 3, "medium",
     "fresh snapshots get different parentage"),
    ("Some snapshots in my regression hunt won't even compile — does that "
     "ruin the binary search?",
     "version_control.pdf", 4, "medium",
     "unbuildable snapshots can be skipped; bracketing survives"),
    ("Which clone flavor fetches file contents only when they're actually "
     "needed?",
     "version_control.pdf", 5, "easy",
     "partial clone defers large content downloads"),

    # ---- build_systems.pdf ----
    ("How does a build tool know it may run two compile steps at the same "
     "time?",
     "build_systems.pdf", 1, "easy",
     "the dependency graph's edges permit parallel scheduling"),
    ("Sources unchanged, but I flipped an optimization flag — what makes "
     "the build rerun anyway?",
     "build_systems.pdf", 2, "medium",
     "the command line is part of the staleness key"),
    ("What property must a compile step have before its result can be "
     "shared from a remote cache?",
     "build_systems.pdf", 3, "easy",
     "pure function of declared inputs (hermetic)"),
    ("Besides correctness, what concurrency benefit does per-action "
     "isolation buy?",
     "build_systems.pdf", 4, "medium",
     "private scratch dirs make parallel actions safe"),
    ("Why does 'works on my machine' usually trace to the compiler rather "
     "than the code?",
     "build_systems.pdf", 5, "medium",
     "host toolchain contamination; pin by digest"),

    # ---- cryptography_basics.pdf ----
    ("Why do block-based ciphers need an extra 'mode' wrapped around "
     "them?",
     "cryptography_basics.pdf", 1, "medium",
     "modes chain fixed-size groups safely"),
    ("What exactly does an eavesdropper see during a public key "
     "agreement, and why doesn't it help them?",
     "cryptography_basics.pdf", 2, "medium",
     "only public halves; recovering the secret is infeasible"),
    ("What two guarantees does verifying a signature give the recipient?",
     "cryptography_basics.pdf", 3, "easy",
     "authorship and that content was unaltered"),
    ("Why does every stored credential get its own random extra input "
     "before hashing?",
     "cryptography_basics.pdf", 4, "easy",
     "unique salts make equal passwords produce different records"),
    ("Why do authenticated modes refuse to explain WHY a message was "
     "rejected?",
     "cryptography_basics.pdf", 5, "hard",
     "tag mismatch discards without revealing; reactions leak"),

    # ---- operating_systems.pdf ----
    ("Why is virtual address translation usually cheap despite the "
     "multi-level tables involved?",
     "operating_systems.pdf", 1, "medium",
     "translation caches make locality the cost model"),
    ("How do priorities work in a scheduler that tracks received "
     "runtime?",
     "operating_systems.pdf", 2, "medium",
     "weights on the runtime accounting, not absolute ranks"),
    ("What design lets steady-state I/O traffic avoid the user-kernel "
     "crossing almost entirely?",
     "operating_systems.pdf", 3, "medium",
     "a shared ring buffer both sides poll"),
    ("Under heavy device load, why does the kernel deliberately delay "
     "some event notifications?",
     "operating_systems.pdf", 4, "medium",
     "interrupt coalescing batches events to cut per-event overhead"),
    ("After duplicating a descriptor, reads through either copy advance "
     "the same position — why?",
     "operating_systems.pdf", 5, "medium",
     "both integers name one object with a shared cursor"),

    # ---- distributed_systems.pdf ----
    ("What do I give up by shrinking the write-acknowledgement set to "
     "speed up writes?",
     "distributed_systems.pdf", 1, "medium",
     "reads can miss recent data when W+R no longer overlaps"),
    ("What stops a node with a stale, incomplete log from becoming the "
     "cluster's leader?",
     "distributed_systems.pdf", 2, "medium",
     "followers only vote for candidates at least as complete"),
    ("What metadata cost do vector clocks pay over plain counters, and "
     "what do they buy?",
     "distributed_systems.pdf", 3, "hard",
     "one counter per node; distinguishing concurrency from causality"),
    ("After a network split heals, what happens to the writes the losing "
     "side had suspended?",
     "distributed_systems.pdf", 4, "medium",
     "replayed or discarded per the declared merge policy"),
    ("Why is exponential backoff alone not enough when thousands of "
     "clients retry a recovering service?",
     "distributed_systems.pdf", 5, "easy",
     "jitter is needed to avoid a thundering herd"),

    # ---- web_servers.pdf ----
    ("How do multiplexed protocols improve on plain connection reuse?",
     "web_servers.pdf", 1, "medium",
     "many logical streams interleave concurrently on one connection"),
    ("Which cross-cutting concerns naturally concentrate at the proxy "
     "tier?",
     "web_servers.pdf", 2, "easy",
     "transport security, compression, request limits"),
    ("Why would a caching layer prefer a hashing router over round-robin "
     "even though it balances worse?",
     "web_servers.pdf", 3, "medium",
     "consistent hashing keeps per-key caches warm"),
    ("What lets a backend skip computing a response nobody will read?",
     "web_servers.pdf", 4, "medium",
     "deadline propagation marks requests whose client gave up"),
    ("How do large file downloads survive a dropped connection without "
     "restarting?",
     "web_servers.pdf", 5, "easy",
     "range requests resume from an offset"),

    # ---- regex_reference.pdf ----
    ("What's the difference between an assertion that consumes nothing "
     "and a class that consumes one character?",
     "regex_reference.pdf", 1, "hard",
     "anchors/boundaries assert positions; classes consume"),
    ("What single character turns a maximal repetition into a minimal "
     "one?",
     "regex_reference.pdf", 2, "easy",
     "appending ? makes a quantifier lazy"),
    ("I need grouping for alternation but don't want to disturb my "
     "numbered captures — what do I use?",
     "regex_reference.pdf", 3, "easy",
     "non-capturing groups"),
    ("Does a negated character class skip over a character or require "
     "one?",
     "regex_reference.pdf", 4, "medium",
     "it consumes exactly one character; not a lookahead"),
    ("Which engine family guarantees linear-time matching, and what "
     "feature do you lose?",
     "regex_reference.pdf", 5, "medium",
     "automaton-based engines; no backreferences"),

    # ---- audio_engineering.pdf ----
    ("Does recording at 192 kHz make audible content more faithful than "
     "96 kHz?",
     "audio_engineering.pdf", 1, "medium",
     "higher rates buy processing headroom, not audible fidelity"),
    ("After compressing the peaks, what restores the track to its former "
     "ceiling?",
     "audio_engineering.pdf", 2, "easy",
     "make-up gain"),
    ("What's the shape trade-off between a shelf and a parametric band?",
     "audio_engineering.pdf", 3, "easy",
     "shelf moves everything past a corner; parametric is centered with "
     "width"),
    ("Why doesn't enlarging the audio buffer help a singer who hears "
     "themselves doubled?",
     "audio_engineering.pdf", 4, "hard",
     "bigger buffers ADD delay; hardware monitoring sidesteps it"),
    ("Streaming loudness is matched — so what limit still constrains my "
     "master?",
     "audio_engineering.pdf", 5, "medium",
     "true-peak limits against inter-sample overshoot"),

    # ---- robotics_control.pdf ----
    ("Which controller term fights overshoot, and what does it amplify "
     "as a side effect?",
     "robotics_control.pdf", 1, "easy",
     "derivative damps overshoot but amplifies sensor noise"),
    ("How does a fusion filter weigh a noisy sensor against a precise "
     "one?",
     "robotics_control.pdf", 2, "easy",
     "measurements corrected by confidence weights"),
    ("Why do smooth polynomial motion profiles matter on a flexible "
     "robot arm?",
     "robotics_control.pdf", 3, "medium",
     "they avoid exciting structural resonances"),
    ("What does a time-optimal motion profile look like in terms of its "
     "constraints?",
     "robotics_control.pdf", 3, "hard",
     "saturate one constraint at a time: max accel, cruise, max brake"),
    ("What kinds of systematic sensor errors does calibration fit, and "
     "from what excitations?",
     "robotics_control.pdf", 5, "medium",
     "offsets, scale, misalignment from poses/spins/fixtures"),

    # ---- spreadsheet_guide.pdf ----
    ("How do I pin just the column of a reference while letting the row "
     "slide during a fill?",
     "spreadsheet_guide.pdf", 1, "medium",
     "absolute marker on the column only"),
    ("One setting flips my cross-tab from totals to averages — where "
     "does that live?",
     "spreadsheet_guide.pdf", 2, "easy",
     "the pivot's aggregate selection"),
    ("When is the sorted approximate lookup actually the CORRECT choice?",
     "spreadsheet_guide.pdf", 3, "hard",
     "bracket-style tables like tax rates"),
    ("How did older spreadsheets produce multi-cell results before "
     "spilling existed?",
     "spreadsheet_guide.pdf", 4, "medium",
     "special entry keystrokes over fixed ranges"),
    ("How does the engine avoid recomputing the whole sheet after one "
     "cell edit?",
     "spreadsheet_guide.pdf", 5, "easy",
     "dependency graph; recompute only affected formulas in topo order"),

    # ---- game_engines.pdf ----
    ("What does the renderer draw if the display refreshes between two "
     "fixed simulation ticks?",
     "game_engines.pdf", 1, "medium",
     "an interpolated state between ticks"),
    ("A bullet passed clean through a thin wall — which test was "
     "missing?",
     "game_engines.pdf", 2, "medium",
     "swept tests extend shapes along their motion"),
    ("Why does storing all transforms in one tight array speed up a "
     "per-frame system?",
     "game_engines.pdf", 3, "medium",
     "dense component arrays turn iteration into cache-friendly sweeps"),
    ("Level designers put sharp corners on the racetrack's fastest "
     "stretch — what streaming problem are they hiding?",
     "game_engines.pdf", 4, "hard",
     "corridors keep players from outrunning the streamer"),
    ("What three properties must simulation code keep for an input "
     "recording to reproduce a session?",
     "game_engines.pdf", 5, "medium",
     "fixed update order, fixed-step arithmetic, seeded randomness"),

    # ---- bioinformatics_primer.pdf ----
    ("What corresponds between two sequences in an optimal alignment "
     "besides matching letters?",
     "bioinformatics_primer.pdf", 1, "easy",
     "substitutions, insertions, deletions scored together"),
    ("What extra data finally disambiguates an assembly graph's repeat "
     "branches?",
     "bioinformatics_primer.pdf", 2, "medium",
     "longer reads or paired ends"),
    ("Beyond disagreement counts, what evidence separates a real variant "
     "from a sequencing artifact?",
     "bioinformatics_primer.pdf", 3, "medium",
     "base quality, mapping confidence, strand balance"),
    ("Why can't raw read counts compare expression between two genes of "
     "different sizes?",
     "bioinformatics_primer.pdf", 4, "easy",
     "normalize for gene length and library depth"),
    ("What do the support numbers on a published species tree's branches "
     "mean?",
     "bioinformatics_primer.pdf", 5, "medium",
     "confidence from resampled alignments"),

    # ---- api_design.pdf ----
    ("How do clients keep working while an incompatible interface "
     "revision rolls out?",
     "api_design.pdf", 1, "easy",
     "version markers let revisions coexist during migration"),
    ("What does the opaque token in cursor pagination actually encode?",
     "api_design.pdf", 2, "medium",
     "a position in a stable ordering"),
    ("How does a support engineer connect a customer's error screenshot "
     "to the exact server trace?",
     "api_design.pdf", 3, "medium",
     "correlation identifiers in the error body"),
    ("What two numbers should a rate-limited response expose so clients "
     "can self-regulate?",
     "api_design.pdf", 4, "easy",
     "remaining quota and reset time"),
    ("For how long must a server remember the outcome stored under a "
     "deduplication key?",
     "api_design.pdf", 5, "hard",
     "the key's retention window bounds exactly-once"),

    # ---- 43 additional held-out queries over the ORIGINAL documents ----
    # arrays_guide
    ("From which end are two shapes compared when deciding if they can "
     "combine?",
     "arrays_guide.pdf", 1, "easy",
     "trailing dimensions backwards"),
    ("What's the reliable test that two arrays share storage?",
     "arrays_guide.pdf", 2, "medium",
     "compare base pointers, not contents"),
    ("How can a long summation stay accurate without changing the "
     "array's own precision?",
     "arrays_guide.pdf", 5, "medium",
     "reductions can accumulate in a wider type"),
    # dataframe_handbook
    ("What check should precede any table merge to avoid a row "
     "explosion?",
     "dataframe_handbook.pdf", 1, "medium",
     "validate key uniqueness"),
    ("My hourly averages should start at midnight, not at my first "
     "sample's timestamp — what option fixes this?",
     "dataframe_handbook.pdf", 4, "medium",
     "anchor window boundaries to calendar units"),
    ("When does replacing category codes with a response statistic beat "
     "indicator columns?",
     "dataframe_handbook.pdf", 5, "hard",
     "target encoding vs one-hot for modeling"),
    # optimizer_manual
    ("Why can a noisier gradient estimate find a BETTER minimum than an "
     "exact one?",
     "optimizer_manual.pdf", 1, "medium",
     "noise escapes sharp minima"),
    ("Clipping each weight's gradient separately versus the whole "
     "vector — what's the qualitative difference?",
     "optimizer_manual.pdf", 4, "hard",
     "per-element clamps distort direction; norm clipping preserves it"),
    ("Exact curvature is unaffordable — what practical structures stand "
     "in for the Hessian?",
     "optimizer_manual.pdf", 5, "medium",
     "diagonal/Kronecker approximations or gradient-difference history"),
    # training_pipeline
    ("After resuming from a snapshot, how does training avoid showing "
     "the model the same batch twice?",
     "training_pipeline.pdf", 1, "medium",
     "the data pipeline fast-forwards to the recorded step"),
    ("What makes an early-stopping patience window too short?",
     "training_pipeline.pdf", 2, "medium",
     "it must exceed normal metric noise"),
    ("When does strong augmentation HURT a model?",
     "training_pipeline.pdf", 4, "medium",
     "aggressive policies destroy signal small models need"),
    # gpu_programming
    ("What's the hardware reason a block's threads can share data "
     "cheaply while two blocks cannot?",
     "gpu_programming.pdf", 1, "hard",
     "blocks schedule independently; on-chip memory is per-block"),
    ("What memory-layout change often pays for itself immediately on "
     "wide processors?",
     "gpu_programming.pdf", 2, "medium",
     "transform layouts so thread groups access consecutively"),
    ("Why do tiled kernels pad their scratch arrays?",
     "gpu_programming.pdf", 3, "hard",
     "padding avoids bank conflicts on same-column access"),
    # memory_management
    ("Why does fixing fragmentation by moving objects require so much "
     "bookkeeping?",
     "memory_management.pdf", 2, "medium",
     "compaction must update every reference to relocated objects"),
    ("What cost does prompt, evenly-spread reclamation impose under "
     "multithreading?",
     "memory_management.pdf", 3, "hard",
     "counter updates contend across threads"),
    ("Where does a tracing collector begin its search for live objects?",
     "memory_management.pdf", 4, "easy",
     "roots: stacks, globals, registers"),
    # database_internals
    ("Why are range scans fast on a sorted-tree index specifically?",
     "database_internals.pdf", 1, "easy",
     "leaves are walked sequentially"),
    ("What does the recovery process replay after a crash, and from "
     "where?",
     "database_internals.pdf", 2, "easy",
     "the write-ahead log from the last checkpoint"),
    ("What background process removes row versions no transaction can "
     "see anymore?",
     "database_internals.pdf", 4, "easy",
     "vacuum reclaims invisible old versions"),
    # networking_guide
    ("What growth pattern does a new connection's send window follow "
     "before its first loss?",
     "networking_guide.pdf", 1, "medium",
     "slow start doubles per round trip, then linear"),
    ("Why do client pools evict members BEFORE the server would time "
     "them out?",
     "networking_guide.pdf", 3, "hard",
     "avoid leasing a connection the peer already closed"),
    ("What mechanism lets a reconnecting client skip the expensive part "
     "of the secure handshake?",
     "networking_guide.pdf", 5, "easy",
     "session resumption saves a round trip"),
    # text_processing
    ("How does a subword vocabulary get BUILT from raw text?",
     "text_processing.pdf", 1, "medium",
     "greedy merging of most frequent adjacent pairs"),
    ("What single number summarizes how well a language model predicts "
     "unseen text?",
     "text_processing.pdf", 3, "easy",
     "perplexity"),
    ("Why did one crafted string freeze my log-scanning service, and "
     "which engine design is immune?",
     "text_processing.pdf", 4, "medium",
     "backtracking blowup; automata engines scan linearly"),
    # search_engines
    ("Which index variant can answer 'these words ADJACENT to each "
     "other'?",
     "search_engines.pdf", 1, "medium",
     "positional postings support phrase queries"),
    ("Name the three ingredients of a classical term weight.",
     "search_engines.pdf", 2, "hard",
     "saturating frequency, rarity discount, length normalization"),
    ("What keeps a polite crawler from overwhelming one site even when "
     "its frontier is full of that site's links?",
     "search_engines.pdf", 3, "easy",
     "per-host rate limits"),
    ("Where does the text shown under each search result come from at "
     "serving time?",
     "search_engines.pdf", 4, "easy",
     "a stored forward copy of the document"),
    # neural_networks
    ("What intermediate data must the backward sweep keep from the "
     "forward pass?",
     "neural_networks.pdf", 1, "medium",
     "the forward activations are reused"),
    ("What's the computational complaint against full attention over "
     "long sequences?",
     "neural_networks.pdf", 2, "easy",
     "quadratic cost in sequence length"),
    ("How do deep stacks of small filters end up seeing the whole "
     "image?",
     "neural_networks.pdf", 3, "medium",
     "stacking grows the receptive field"),
    ("Besides dropout, what update-time pressure bounds a network's "
     "complexity?",
     "neural_networks.pdf", 4, "easy",
     "weight decay shrinks parameters every step"),
    # probability_primer
    ("What role does the denominator play in belief updating?",
     "probability_primer.pdf", 1, "hard",
     "the evidence's marginal probability normalizes the posterior"),
    ("Which law links counts of rare events to the gaps between them?",
     "probability_primer.pdf", 2, "medium",
     "Poisson counts, exponential waiting times"),
    ("How do practitioners check that their posterior sampler actually "
     "mixed?",
     "probability_primer.pdf", 3, "medium",
     "discard burn-in, compare multiple chains"),
    ("What two things raise a test's chance of catching a real effect?",
     "probability_primer.pdf", 4, "medium",
     "sample size and effect magnitude"),
    # linear_algebra
    ("Which factorization ORDERS the directions a linear map stretches?",
     "linear_algebra.pdf", 1, "medium",
     "the singular value decomposition"),
    ("Why do direct factorizations struggle on matrices that are almost "
     "all zeros?",
     "linear_algebra.pdf", 3, "medium",
     "fill-in destroys sparsity; iterative methods keep it"),
    ("Can a clever algorithm beat the condition number's error bound?",
     "linear_algebra.pdf", 4, "hard",
     "no: conditioning bounds any algorithm; stability only avoids adding "
     "more"),
    # signal / compilers / concurrency / storage / image
    ("Above what rate do extra samples stop adding recoverable "
     "information?",
     "signal_processing.pdf", 2, "medium",
     "twice the highest frequency present"),
    ("What runtime mechanism lets speculatively compiled code admit it "
     "guessed wrong?",
     "compilers_handbook.pdf", 4, "medium",
     "guards deoptimize back to the interpreter via a side table"),
    ("Why does an idle worker steal the OLDEST task from a victim's "
     "queue rather than the newest?",
     "concurrency_patterns.pdf", 4, "hard",
     "oldest tasks are the largest subtrees; owner keeps cache-warm work"),
    ("What per-file structure lets a point lookup skip most sorted runs "
     "entirely?",
     "storage_systems.pdf", 1, "medium",
     "Bloom filters exclude files that cannot contain the key"),
    ("Why do compressed formats spend fewer bits on color than on "
     "brightness?",
     "image_processing.pdf", 2, "medium",
     "the eye resolves chroma detail worse than luminance"),
]

# Fresh rejection classes: technical-sounding, zero answering content in
# the corpus or distractors; disjoint from the dev split's rejection
# topics and from training/ood.py's template banks.
HELDOUT_REJECTION_QUERIES_V3 = [
    "What baud rate does the Modbus RTU standard default to?",
    "How many satellites does a GPS receiver need for a 3D fix?",
    "What's the legal maximum axle load for trucks on EU motorways?",
    "Which enzyme does CRISPR-Cas9 use to cut double-stranded DNA?",
    "What is the standard tuning frequency of a concert harp's middle C?",
    "How thick is the tempered glass on a standard squash court wall?",
    "What refrigerant replaced R-22 in modern residential heat pumps?",
    "Which ISO standard governs fire resistance ratings for ship "
    "bulkheads?",
    "What's the minimum ceiling height for FIBA-certified basketball "
    "courts?",
    "How much torque should the head bolts on a small-block V8 get?",
]

assert len(HELDOUT_QUERIES_V3) == 112, len(HELDOUT_QUERIES_V3)
assert len(HELDOUT_REJECTION_QUERIES_V3) == 10
