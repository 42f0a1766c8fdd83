"""Round-3 corpus extension: 12 additional authored documents (60 pages).

VERDICT r2 weak #4: with 45 retrieval queries per split, one query is
worth 0.022 hit-rate — adoption decisions sat inside noise. This
extension grows the corpus so both splits can carry >= 150 retrieval
queries (granularity <= 0.007) with gold pages to spare.

Same design discipline as corpus_data.py (see its docstring): one
technical-manual register, heavy cross-document keyword traps — terms
like "merge", "pool", "page", "alignment", "sampling", "key", "frame",
"pivot" each appear in several documents with different meanings, so
lexical matching alone cannot resolve the medium/hard tiers. All text is
original (authored for this harness, excluded from encoder training via
corpus.passage_hashes).
"""

DOCS_V3 = [
    {
        "doc": "version_control.pdf",
        "category": "devtools",
        "pages": [
            "THE STAGING INDEX\n"
            "Between the working tree and the committed history sits the "
            "staging index: a manifest of exactly what the next snapshot will "
            "contain. Adding a file copies its current content into the "
            "object store and records the hash in the index, so later edits "
            "to the same file are invisible to the pending snapshot until "
            "staged again. Reviewing the staged diff rather than the working "
            "diff is the reliable way to know what will actually land.",
            "MERGING BRANCHES\n"
            "A merge finds the common ancestor of two branch tips and "
            "combines the changes made on each side since that point. "
            "Non-overlapping edits combine automatically; edits to the same "
            "lines produce conflict markers that must be resolved by hand "
            "before the merge can conclude. A fast-forward occurs when one "
            "tip is an ancestor of the other: the pointer simply advances "
            "and no new merge snapshot is created.",
            "REWRITING HISTORY\n"
            "Rebasing replays a branch's commits one at a time onto a new "
            "base, producing fresh snapshots with the same content changes "
            "but different parentage. Because the original commits are "
            "discarded, rebasing published work strands collaborators whose "
            "copies still reference the old identifiers. The reflog retains "
            "abandoned snapshots for a grace period, so a botched rewrite "
            "can be undone by resetting to the prior tip.",
            "BISECTING REGRESSIONS\n"
            "When a defect appeared somewhere in a long range of snapshots, "
            "binary search finds the culprit in logarithmically many steps: "
            "mark one snapshot good and one bad, and the tool repeatedly "
            "checks out the midpoint for testing. An automated test command "
            "turns the whole hunt into a single unattended run. Snapshots "
            "that cannot be built may be skipped without losing the "
            "bracketing invariant.",
            "SHALLOW AND PARTIAL CLONES\n"
            "A shallow clone truncates history to a recent depth, trading "
            "archaeology for a small fast transfer, while a partial clone "
            "defers downloading large file contents until they are actually "
            "needed. Continuous-integration jobs that only build the tip "
            "benefit most. Deepening later is possible, but operations that "
            "walk ancestry, such as blame or bisect, will stall at the "
            "truncation boundary until more history is fetched.",
        ],
    },
    {
        "doc": "build_systems.pdf",
        "category": "devtools",
        "pages": [
            "THE DEPENDENCY GRAPH\n"
            "A build is a directed acyclic graph whose nodes are files and "
            "whose edges say which outputs are derived from which inputs. "
            "The scheduler topologically orders the graph and runs any "
            "actions whose inputs changed, in parallel where the edges "
            "permit. Undeclared dependencies are the classic failure: the "
            "output silently goes stale because the graph never knew an "
            "input existed.",
            "INCREMENTAL REBUILDS\n"
            "Deciding staleness by file modification time is fragile: clock "
            "skew, restored backups, and touch without change all mislead "
            "it. Content digests are robust — an action reruns only when "
            "the hash of an input actually differs. Recording the command "
            "line inside the staleness key catches the case where the "
            "sources are identical but the compiler flags changed.",
            "REMOTE ACTION CACHING\n"
            "If an action is a pure function of its declared inputs, its "
            "output can be keyed by the input digests and shared through a "
            "remote cache: the second machine to request the same key "
            "downloads the artifact instead of rebuilding it. Impure "
            "actions poison such a cache, which is why hermetic builds ban "
            "absolute paths, timestamps, and network access inside actions.",
            "SANDBOXED EXECUTION\n"
            "Running each action in a sandbox that exposes only its "
            "declared inputs converts undeclared-dependency bugs from "
            "silent staleness into loud failures: the file simply is not "
            "there. Sandboxes also make parallel actions safe by giving "
            "each a private scratch directory, at the cost of some setup "
            "overhead per action that batching can amortize.",
            "TOOLCHAIN PINNING\n"
            "A reproducible build pins the exact compiler, linker, and "
            "standard library rather than using whatever the host provides. "
            "Pinned toolchains are fetched as versioned archives and "
            "referenced by digest, so two checkouts years apart produce "
            "bit-identical artifacts. Host contamination — a stray include "
            "path or an ambient environment variable — is the usual source "
            "of machines that build differently.",
        ],
    },
    {
        "doc": "cryptography_basics.pdf",
        "category": "security",
        "pages": [
            "SYMMETRIC CIPHERS\n"
            "A symmetric cipher scrambles data under a secret key shared by "
            "both parties. Block ciphers process fixed-size groups and need "
            "a mode of operation to chain groups safely; reusing a "
            "counter or initialization vector under the same key is the "
            "canonical catastrophic mistake, as identical keystream then "
            "encrypts different messages. Stream variants generate a "
            "keystream that is combined with the data byte by byte.",
            "PUBLIC-KEY EXCHANGE\n"
            "Two parties who have never met can agree on a shared secret "
            "over an open channel: each publishes a value derived from a "
            "private number, and combining one's own private number with "
            "the other's public value lands both at the same result. An "
            "eavesdropper sees only the public halves, and recovering the "
            "secret from them is believed computationally infeasible at "
            "proper parameter sizes.",
            "DIGESTS AND SIGNATURES\n"
            "A cryptographic digest condenses any input into a fixed-size "
            "fingerprint such that finding two inputs with the same "
            "fingerprint is infeasible. Signing works on the digest rather "
            "than the message: the signer encrypts the fingerprint with a "
            "private key, and anyone holding the public half can verify "
            "both authorship and that the content was not altered in "
            "transit.",
            "PASSWORD STORAGE\n"
            "Credentials are never stored raw: each password is run through "
            "a deliberately slow derivation function together with a unique "
            "random salt, so equal passwords produce different records and "
            "bulk guessing is throttled by the function's cost parameter. "
            "Fast general-purpose digests are the wrong tool here precisely "
            "because attackers can evaluate them billions of times per "
            "second on commodity hardware.",
            "AUTHENTICATED ENCRYPTION\n"
            "Confidentiality without integrity is a trap: an attacker who "
            "cannot read a ciphertext may still flip its bits and observe "
            "how the receiver reacts. Authenticated modes attach a tag "
            "computed over the ciphertext and associated context; the "
            "receiver verifies the tag before decrypting anything, and a "
            "mismatch discards the message without revealing why.",
        ],
    },
    {
        "doc": "operating_systems.pdf",
        "category": "systems",
        "pages": [
            "VIRTUAL MEMORY PAGING\n"
            "Each process sees a private flat address space; hardware "
            "translates its addresses through per-process tables to "
            "physical frames. A reference to an address whose page is not "
            "resident raises a fault, and the kernel either fetches the "
            "page from backing store or kills the offender. Translation "
            "caches make the common case fast, so the cost model is ruled "
            "by locality, not table depth.",
            "PROCESS SCHEDULING\n"
            "The scheduler multiplexes runnable tasks over cores. "
            "Completely fair designs track each task's received runtime "
            "and always run the furthest-behind one, with priorities "
            "expressed as weights on the accounting rather than absolute "
            "ranks. Interactive latency comes from preemption: a waking "
            "task with little accumulated runtime immediately displaces a "
            "long-running batch task.",
            "SYSTEM CALL BOUNDARY\n"
            "Crossing from user code into the kernel flushes enough state "
            "to be safe and switches stacks, which costs far more than a "
            "function call. Interfaces batch work to amortize the "
            "crossing: submitting many I/O operations in one call, or "
            "mapping a ring buffer that both sides poll so steady-state "
            "traffic crosses the boundary rarely.",
            "INTERRUPTS AND BOTTOM HALVES\n"
            "Devices signal completion asynchronously; the handler that "
            "runs immediately must be minimal because it executes with "
            "other interrupts masked. Real work is deferred to a bottom "
            "half scheduled at a friendlier time. Coalescing strategies "
            "batch many device events into one interrupt under load, "
            "trading a little latency for a large drop in per-event "
            "overhead.",
            "FILE DESCRIPTORS\n"
            "A descriptor is a small integer naming an entry in the "
            "process's table of open objects — files, sockets, pipes, and "
            "timers share the namespace. Duplication makes two integers "
            "refer to one underlying object with a shared cursor. "
            "Readiness multiplexers let one thread sleep on hundreds of "
            "descriptors and wake only when some subset can make progress.",
        ],
    },
    {
        "doc": "distributed_systems.pdf",
        "category": "systems",
        "pages": [
            "REPLICATION AND QUORUMS\n"
            "Copies of the data live on several nodes so reads survive "
            "failures. If writes must be acknowledged by W replicas and "
            "reads consult R, overlap is guaranteed whenever W plus R "
            "exceeds the replica count — some node in every read set has "
            "seen the latest write. Tuning W down buys write latency at "
            "the price of widening the window where reads can miss recent "
            "data.",
            "LEADER ELECTION\n"
            "Consensus protocols elect a single leader to order updates. "
            "Followers grant their vote to a candidate whose log is at "
            "least as complete as their own, and a candidate becomes "
            "leader on a majority of votes. Randomized election timeouts "
            "break the symmetry that would otherwise let rival candidates "
            "split the vote round after round.",
            "CLOCKS AND CAUSALITY\n"
            "Wall clocks on different machines drift, so ordering events "
            "by timestamp lies. Logical counters capture causality "
            "instead: each message carries the sender's counter, and the "
            "receiver advances to one past the maximum seen. Vector "
            "variants keep one counter per node and can distinguish "
            "concurrent events from causally ordered ones, at linear "
            "metadata cost.",
            "PARTITION TOLERANCE\n"
            "When the network splits, a system must choose between "
            "answering with possibly stale data and refusing to answer at "
            "all. Majority-side designs keep serving from the partition "
            "holding a quorum while the minority blocks; reconciliation "
            "on heal replays the minority's suspended updates or discards "
            "conflicting ones according to a declared merge policy.",
            "IDEMPOTENT RETRIES\n"
            "A timeout tells the client nothing: the request may have "
            "failed, succeeded, or still be in flight. Safe retry "
            "therefore requires idempotency — either naturally, or "
            "manufactured by attaching a unique request token the server "
            "remembers long enough to deduplicate. Exponential backoff "
            "with jitter keeps a thundering herd of retries from "
            "finishing off a recovering service.",
        ],
    },
    {
        "doc": "web_servers.pdf",
        "category": "systems",
        "pages": [
            "CONNECTION LIFECYCLES\n"
            "Opening a fresh transport connection per request pays "
            "handshake latency every time; keep-alive reuses one "
            "connection for many sequential requests, and multiplexed "
            "protocols interleave many logical streams over it "
            "concurrently. Servers bound idle lifetimes so abandoned "
            "connections do not pin memory, closing them quietly after a "
            "grace period.",
            "REVERSE PROXIES\n"
            "A reverse proxy terminates client connections and forwards "
            "requests to backend workers, hiding deployment topology. It "
            "concentrates cross-cutting concerns — transport security, "
            "compression, request limits — in one tier, and can retry an "
            "idempotent request against a second backend when the first "
            "fails, masking single-worker crashes from clients entirely.",
            "LOAD BALANCING POLICIES\n"
            "Round-robin spreads requests evenly but ignores cost "
            "variance; least-outstanding sends each request to the worker "
            "with the fewest in flight, which automatically routes around "
            "a slow node. Consistent hashing pins a key to a worker so "
            "caches stay warm, moving only a small fraction of keys when "
            "the worker set changes.",
            "BACKPRESSURE AND SHEDDING\n"
            "Accepting work faster than it can be served converts "
            "overload into timeouts for everyone. Bounded queues with "
            "early rejection keep latency predictable: beyond a depth "
            "threshold the server immediately returns a retriable "
            "too-busy response. Deadline propagation lets a backend skip "
            "work whose client has already given up waiting.",
            "STATIC ASSET SERVING\n"
            "Immutable assets are served with far-future cache lifetimes "
            "and content-addressed names, so a deploy changes the name "
            "rather than invalidating caches. Range requests resume "
            "interrupted downloads of large files. Negotiated compression "
            "trades CPU for bandwidth, with precompressed variants "
            "avoiding the per-request cost for hot assets.",
        ],
    },
    {
        "doc": "regex_reference.pdf",
        "category": "text",
        "pages": [
            "ANCHORS AND BOUNDARIES\n"
            "Anchors assert positions instead of consuming characters: "
            "start and end of line, and the boundary between a word "
            "character and a non-word character. A pattern without "
            "anchors matches anywhere inside the text, which is the usual "
            "surprise when validation intended the whole input — wrap the "
            "pattern in both anchors to claim the full string.",
            "GREEDY AND LAZY QUANTIFIERS\n"
            "Repetition is greedy by default: it consumes as much as "
            "possible and backs off only when the rest of the pattern "
            "cannot match. Appending a question mark makes it lazy, "
            "consuming as little as possible. The classic failure is a "
            "greedy wildcard between delimiters swallowing across several "
            "records and matching from the first opener to the last "
            "closer.",
            "CAPTURE GROUPS\n"
            "Parentheses both group and capture: the engine records the "
            "span each group matched, retrievable by number or by name. "
            "Non-capturing groups give the grouping without the cost and "
            "renumbering hazards. Backreferences let the pattern itself "
            "demand a repeat of an earlier capture, as when matching an "
            "opening and closing quote of the same kind.",
            "CHARACTER CLASSES\n"
            "Square brackets match one character from a set, with ranges, "
            "negation, and predefined shorthands for digits, whitespace, "
            "and word characters. Inside a class most metacharacters lose "
            "their special meaning, which routinely reverses intuitions "
            "about what needs escaping. A negated class still consumes "
            "exactly one character — it is not a lookahead.",
            "CATASTROPHIC BACKTRACKING\n"
            "Nested quantifiers over overlapping alternatives create "
            "exponentially many ways to split the same text, and a near "
            "miss forces the engine to try them all before failing. "
            "Defenses include possessive quantifiers, atomic groups, "
            "rewriting the pattern so alternatives cannot overlap, or "
            "switching to an automaton-based engine with linear-time "
            "guarantees.",
        ],
    },
    {
        "doc": "audio_engineering.pdf",
        "category": "media",
        "pages": [
            "SAMPLING AND ALIASING\n"
            "Digitizing sound measures amplitude at a fixed rate; any "
            "frequency above half that rate folds back into the audible "
            "band as a spurious tone. Capture chains therefore low-pass "
            "the analog signal before measurement. Higher rates buy "
            "headroom for processing, not audible fidelity, once the "
            "folding threshold clears the hearing range.",
            "DYNAMIC RANGE COMPRESSION\n"
            "A compressor attenuates signal above a threshold by a set "
            "ratio, with attack and release times governing how fast the "
            "gain reacts. Gentle settings tame peaks so the average level "
            "can rise; extreme settings audibly pump as the gain chases "
            "the envelope. Make-up gain restores the reduced peaks to the "
            "previous ceiling.",
            "EQUALIZATION\n"
            "Filters reshape the spectrum: shelves lift or drop everything "
            "beyond a corner frequency, while parametric bands boost or "
            "cut around a center with adjustable width. Subtractive "
            "habits beat additive ones — removing a resonance is usually "
            "cleaner than boosting everything else to mask it. Narrow "
            "deep cuts excise problem tones with little audible "
            "footprint.",
            "LATENCY AND BUFFERS\n"
            "Audio interfaces exchange samples in fixed-size buffers; "
            "larger buffers survive scheduling hiccups but add a full "
            "buffer of delay each way, which performers hear as an echo "
            "of their own playing. Monitoring mixes routed in hardware "
            "sidestep the round trip entirely, leaving the computer's "
            "latency to matter only for playback alignment.",
            "LOUDNESS NORMALIZATION\n"
            "Delivery platforms now match programs by integrated "
            "perceptual loudness rather than peak level, measuring the "
            "whole program through an ear-weighted filter. Mixes crushed "
            "to win the old peak-based race simply get turned down, "
            "surrendering their dynamics for nothing. True-peak limits "
            "still apply to stop inter-sample overshoot in converters.",
        ],
    },
    {
        "doc": "robotics_control.pdf",
        "category": "control",
        "pages": [
            "FEEDBACK LOOPS\n"
            "A controller compares the measured state against the "
            "reference and applies a correction proportional to the "
            "error, plus terms integrating past error and anticipating "
            "its trend. Too much proportional gain oscillates; the "
            "integral term removes steady offset but winds up during "
            "saturation unless clamped; the derivative term damps "
            "overshoot at the cost of amplifying sensor noise.",
            "STATE ESTIMATION\n"
            "Sensors disagree and arrive at different rates, so the "
            "controller runs a probabilistic filter: predict the state "
            "forward through a motion model, then correct the prediction "
            "with each measurement weighted by its confidence. The "
            "filter's covariance tracks how uncertain the estimate is, "
            "widening during blackouts and tightening when measurements "
            "agree.",
            "TRAJECTORY PLANNING\n"
            "A planned path becomes a trajectory once timestamps are "
            "assigned subject to velocity and acceleration ceilings. "
            "Smooth polynomial segments avoid exciting structural "
            "resonances; time-optimal profiles saturate one constraint "
            "at a time, accelerating flat out, cruising at the speed "
            "ceiling, then braking at the limit.",
            "ACTUATOR SATURATION\n"
            "Commands beyond an actuator's capability are silently "
            "clipped, and the controller's model of the plant diverges "
            "from reality during the clip. Anti-windup feeds the "
            "difference between commanded and achieved output back into "
            "the integrator so the controller does not accumulate "
            "impossible demands and overshoot violently when headroom "
            "returns.",
            "SENSOR CALIBRATION\n"
            "Raw readings embed systematic offsets, scale errors, and "
            "axis misalignments. Calibration fits those parameters from "
            "known excitations — stationary poses, rate-table spins, or "
            "reference fixtures — and the runtime inverts the fitted "
            "model before fusing data. Temperature drift motivates "
            "re-fitting bias terms continuously in the background.",
        ],
    },
    {
        "doc": "spreadsheet_guide.pdf",
        "category": "data",
        "pages": [
            "CELL REFERENCES\n"
            "A formula addresses other cells relatively by default, so "
            "copying it shifts the addresses with the move. Fixing the "
            "column, the row, or both with absolute markers pins the "
            "address during fills. Most broken models trace back to a "
            "fill that silently re-aimed a reference the author believed "
            "was anchored.",
            "PIVOT SUMMARIES\n"
            "A pivot summarizes a flat table by distributing one column's "
            "values across rows and another's across columns, aggregating "
            "the measure at each intersection. Changing the aggregate "
            "from sum to count or average is one setting, and the source "
            "rows behind any summary figure can be expanded for audit.",
            "LOOKUP FUNCTIONS\n"
            "A lookup scans a key column and returns a companion value "
            "from the matched row. Approximate-match mode assumes the "
            "keys are sorted and returns the last key not exceeding the "
            "probe — correct for tax brackets, quietly wrong for exact "
            "identifiers. Exact-match functions with explicit not-found "
            "handling make the failure visible instead.",
            "ARRAY FORMULAS\n"
            "Modern engines spill: a single formula can return a whole "
            "block of results that flows into neighboring cells, "
            "recalculating as one unit. A spill is blocked when any "
            "target cell is occupied, producing an error rather than "
            "overwriting data. Legacy sheets achieved the same with "
            "special entry keystrokes and fixed ranges.",
            "RECALCULATION ORDER\n"
            "The engine builds a dependency graph of formulas and "
            "recomputes only what a change can affect, in topological "
            "order. Circular references break the ordering; iterative "
            "mode instead cycles them until values move less than a "
            "tolerance or a cap is hit, which approximates fixed points "
            "but can hide genuine mistakes.",
        ],
    },
    {
        "doc": "game_engines.pdf",
        "category": "media",
        "pages": [
            "THE FRAME LOOP\n"
            "Each frame the engine consumes input, advances simulation, "
            "and renders. Tying simulation steps to render rate makes "
            "physics behave differently on faster displays; the robust "
            "pattern advances simulation in fixed increments, rendering "
            "interpolated states between them, so gameplay is identical "
            "at any refresh rate.",
            "COLLISION DETECTION\n"
            "Exact intersection tests between complex shapes are costly, "
            "so a broad phase first prunes pairs using cheap bounding "
            "volumes arranged in spatial structures; only surviving "
            "pairs reach the narrow phase's precise geometry tests. Fast "
            "movers tunnel through thin walls between steps unless swept "
            "tests extend shapes along their motion.",
            "ENTITY COMPOSITION\n"
            "Deep inheritance trees of game-object classes grow brittle; "
            "composition attaches small data components to plain entity "
            "identifiers, and systems iterate over all entities carrying "
            "a given component set. Storing each component type densely "
            "in arrays turns per-frame iteration into cache-friendly "
            "sweeps instead of pointer chases.",
            "ASSET STREAMING\n"
            "Worlds larger than memory load in the background as the "
            "player moves: nearby regions at full detail, distant ones "
            "as cheap stand-ins. Priority follows predicted movement, "
            "and budgets cap how much loading shares each frame. A "
            "visible pop occurs when the player outruns the streamer, "
            "so design funnels high-speed routes through corridors.",
            "DETERMINISTIC REPLAY\n"
            "Recording only the input stream reproduces a whole session "
            "if simulation is deterministic: same order of updates, "
            "fixed-step arithmetic, and seeded randomness. Replays then "
            "double as bug reports and as the anti-cheat basis, since a "
            "claimed outcome can be re-simulated and checked against the "
            "recording.",
        ],
    },
    {
        "doc": "bioinformatics_primer.pdf",
        "category": "science",
        "pages": [
            "SEQUENCE ALIGNMENT\n"
            "Comparing two genetic sequences means finding the best "
            "scoring correspondence allowing substitutions, insertions, "
            "and deletions. Dynamic programming guarantees the optimum "
            "in time proportional to the product of the lengths, which "
            "is why large-scale search first seeds candidate regions "
            "with exact short-word matches and only extends the "
            "promising ones.",
            "READ ASSEMBLY\n"
            "Sequencers emit millions of short fragments from random "
            "positions; assembly stitches them into long contiguous "
            "stretches by overlap. Graph formulations break reads into "
            "fixed-length words and walk paths through the word graph. "
            "Repeated regions longer than the read length create "
            "ambiguous branches that only longer reads or paired ends "
            "can resolve.",
            "VARIANT CALLING\n"
            "After mapping reads against a reference, positions where "
            "many reads disagree with it suggest variants. Callers "
            "weigh the base-quality scores, the mapping confidence, and "
            "strand balance to separate true polymorphisms from "
            "sequencing error, emitting genotype likelihoods rather "
            "than hard calls so downstream analysis can set its own "
            "thresholds.",
            "EXPRESSION QUANTIFICATION\n"
            "Transcript abundance is estimated by counting reads per "
            "gene and normalizing for gene length and library depth. "
            "Reads overlapping several transcripts are fractionally "
            "assigned by an expectation procedure. Comparisons across "
            "conditions model count dispersion explicitly, because "
            "biological replicates vary far more than sampling alone "
            "predicts.",
            "PHYLOGENETIC TREES\n"
            "Relatedness among species is inferred by scoring candidate "
            "trees against aligned sequences under a substitution "
            "model. Exhaustive search is hopeless — tree space grows "
            "super-exponentially — so heuristics rearrange subtrees "
            "from a greedy start, and support values from resampled "
            "alignments quantify confidence in each branch.",
        ],
    },
    {
        "doc": "api_design.pdf",
        "category": "devtools",
        "pages": [
            "VERSIONING CONTRACTS\n"
            "Once published, an interface is a promise. Additive changes "
            "— new optional fields, new endpoints — are safe; renaming, "
            "retyping, or repurposing existing fields breaks callers "
            "silently. Version markers in the path or headers let "
            "incompatible revisions coexist while clients migrate on "
            "their own schedule, with sunset dates communicated well "
            "ahead.",
            "PAGINATION STYLES\n"
            "Offset pagination is easy to cache and jump around in, but "
            "drifts when rows are inserted mid-scan, repeating or "
            "skipping items. Cursor pagination hands the client an "
            "opaque token encoding its position in a stable ordering, "
            "surviving concurrent writes at the cost of random access. "
            "Page-size ceilings protect the server from pathological "
            "requests.",
            "ERROR SEMANTICS\n"
            "Useful errors separate the machine-readable class — "
            "retriable or not, caller's fault or server's — from the "
            "human-readable diagnosis. Stable error codes let clients "
            "branch without parsing prose; correlation identifiers tie a "
            "client report to the server-side trace. Retriable failures "
            "should state how long to wait before trying again.",
            "RATE LIMITING\n"
            "Token buckets grant each caller a refill rate plus a burst "
            "allowance, smoothing traffic without punishing short "
            "spikes. Responses expose remaining quota and reset time so "
            "well-behaved clients self-regulate. Limits keyed only by "
            "network address collapse under shared egress points, so "
            "authenticated identities make fairer keys.",
            "IDEMPOTENCY KEYS\n"
            "Creation endpoints risk duplicates under retry: the "
            "request that timed out may have succeeded. Clients attach "
            "a unique key per logical operation; the server stores the "
            "first outcome under that key and replays it verbatim for "
            "any retry, converting at-least-once transport into "
            "exactly-once effect within the key's retention window.",
        ],
    },
]

# 105 additional DEV retrieval queries (65 over the new documents, 40 over
# the original 18), same tuple format and difficulty semantics as
# corpus_data.QUERIES. Authored fresh for round 3; none copied from the
# held-out split.
QUERIES_V3 = [
    # ---- version_control.pdf ----
    ("Why doesn't my latest edit show up in the commit I just prepared, "
     "even though I added the file earlier?",
     "version_control.pdf", 1, "medium",
     "staging copies content at add time; later edits need re-staging"),
    ("When does combining two branches finish without creating any new "
     "snapshot at all?",
     "version_control.pdf", 2, "medium",
     "fast-forward: one tip is an ancestor of the other"),
    ("I rewrote my branch onto a new base and now teammates are stuck on "
     "ghosts of the old commits — what happened and is anything "
     "recoverable?",
     "version_control.pdf", 3, "medium",
     "rebase discards originals; reflog retains them for a grace period"),
    ("What's the quickest systematic way to find which change in a "
     "thousand-commit range broke the test suite?",
     "version_control.pdf", 4, "easy",
     "binary search over snapshots; automated test command"),
    ("My CI checkout is tiny and fast but blame stops working past a "
     "certain point — why?",
     "version_control.pdf", 5, "medium",
     "shallow clone truncates history; ancestry walks stall at the cut"),

    # ---- build_systems.pdf ----
    ("An output keeps going stale without the build noticing — what's the "
     "classic cause?",
     "build_systems.pdf", 1, "medium",
     "an undeclared dependency the graph never knew about"),
    ("Why is hashing file contents a better rebuild trigger than checking "
     "modification times?",
     "build_systems.pdf", 2, "easy",
     "clock skew/backup restores mislead mtimes; digests are robust"),
    ("What stops two different machines from sharing each other's compiled "
     "artifacts through a common cache?",
     "build_systems.pdf", 3, "medium",
     "impure actions poison the cache; hermeticity bans paths/timestamps"),
    ("How does running every compile step inside an isolated directory "
     "turn a subtle staleness bug into an immediate hard error?",
     "build_systems.pdf", 4, "medium",
     "sandbox exposes only declared inputs; missing file fails loudly"),
    ("Two-year-old checkouts of our project build different binaries on "
     "different laptops — what discipline prevents that?",
     "build_systems.pdf", 5, "medium",
     "pin toolchains by digest; avoid host contamination"),

    # ---- cryptography_basics.pdf ----
    ("What goes catastrophically wrong if the same counter value is used "
     "twice under one encryption key?",
     "cryptography_basics.pdf", 1, "easy",
     "identical keystream encrypts different messages"),
    ("How can two strangers end up with a common secret while everyone "
     "watches their conversation?",
     "cryptography_basics.pdf", 2, "medium",
     "each combines own private number with the other's public value"),
    ("Why is a document signed by encrypting its fingerprint rather than "
     "the whole document?",
     "cryptography_basics.pdf", 3, "easy",
     "signatures work on the fixed-size digest"),
    ("Why shouldn't I protect login credentials with the same fast hash I "
     "use for file integrity?",
     "cryptography_basics.pdf", 4, "medium",
     "password storage needs slow salted derivation to throttle guessing"),
    ("Why must the receiver check the integrity tag before decrypting a "
     "single byte?",
     "cryptography_basics.pdf", 5, "medium",
     "bit-flipping attacks observe reactions; verify-then-decrypt"),

    # ---- operating_systems.pdf ----
    ("What happens the instant a program touches an address whose backing "
     "page isn't in physical memory?",
     "operating_systems.pdf", 1, "easy",
     "page fault; kernel fetches from backing store or kills"),
    ("How does a 'completely fair' scheduler decide which task runs next "
     "and still favor interactive ones?",
     "operating_systems.pdf", 2, "medium",
     "runs the furthest-behind runtime; wakers preempt batch tasks"),
    ("Why do modern I/O interfaces try to cross into the kernel as rarely "
     "as possible, and how?",
     "operating_systems.pdf", 3, "medium",
     "crossings are expensive; batch submissions / shared ring buffers"),
    ("Why do device drivers postpone most of their work instead of doing "
     "it inside the interrupt handler?",
     "operating_systems.pdf", 4, "easy",
     "handlers run with interrupts masked; defer to bottom halves"),
    ("How can one thread wait on hundreds of sockets at once without "
     "burning CPU?",
     "operating_systems.pdf", 5, "easy",
     "readiness multiplexers sleep on descriptor sets"),

    # ---- distributed_systems.pdf ----
    ("With five copies of my data, how many must acknowledge a write so "
     "any read of three is guaranteed current?",
     "distributed_systems.pdf", 1, "medium",
     "W+R must exceed replica count; W=3 with R=3 over 5"),
    ("How do consensus systems avoid two candidates endlessly splitting "
     "the vote?",
     "distributed_systems.pdf", 2, "easy",
     "randomized election timeouts break symmetry"),
    ("Machines' clocks disagree — how do we still tell which of two "
     "events could have caused the other?",
     "distributed_systems.pdf", 3, "medium",
     "logical/vector counters capture causality, not wall time"),
    ("During a network split, why does the smaller side of the cluster "
     "refuse to serve writes?",
     "distributed_systems.pdf", 4, "medium",
     "only the quorum side serves; minority blocks until heal"),
    ("A request timed out — the server might have done it anyway. How do "
     "I retry without double-charging?",
     "distributed_systems.pdf", 5, "medium",
     "idempotency via unique request tokens; backoff with jitter"),

    # ---- web_servers.pdf ----
    ("Why does reusing one transport connection for many requests speed "
     "things up so much?",
     "web_servers.pdf", 1, "easy",
     "keep-alive skips per-request handshake latency"),
    ("What layer lets a crashed backend worker go completely unnoticed by "
     "the client?",
     "web_servers.pdf", 2, "medium",
     "reverse proxy retries idempotent requests on another backend"),
    ("Which request-routing policy automatically steers traffic away from "
     "a slow worker without any health signal?",
     "web_servers.pdf", 3, "medium",
     "least-outstanding requests"),
    ("Why is it kinder to reject a request immediately than to queue it "
     "when the server is saturated?",
     "web_servers.pdf", 4, "medium",
     "bounded queues + early retriable rejection keep latency sane"),
    ("How do sites make browsers cache a file forever yet pick up new "
     "versions instantly after a deploy?",
     "web_servers.pdf", 5, "medium",
     "content-addressed names change instead of invalidating caches"),

    # ---- regex_reference.pdf ----
    ("My validation pattern accepts garbage as long as a valid substring "
     "appears somewhere inside — what did I forget?",
     "regex_reference.pdf", 1, "medium",
     "anchor both ends to claim the whole input"),
    ("Why did my delimited-field pattern gobble up three records in one "
     "match?",
     "regex_reference.pdf", 2, "medium",
     "greedy wildcard spans from first opener to last closer"),
    ("How can a pattern insist that its closing quote is the same kind as "
     "its opening quote?",
     "regex_reference.pdf", 3, "medium",
     "backreference to an earlier capture group"),
    ("Inside square brackets, do I still need to escape the dot and the "
     "plus sign?",
     "regex_reference.pdf", 4, "easy",
     "most metacharacters lose special meaning inside a class"),
    ("A nearly-matching input makes my pattern run for minutes before "
     "failing — what's the structural cause?",
     "regex_reference.pdf", 5, "medium",
     "nested quantifiers over overlapping alternatives backtrack "
     "exponentially"),

    # ---- audio_engineering.pdf ----
    ("Recording at a low rate added phantom tones that were never in the "
     "room — where do they come from?",
     "audio_engineering.pdf", 1, "medium",
     "frequencies above half the rate fold back: aliasing"),
    ("What do attack and release times control on a dynamics processor, "
     "and what artifact appears when they're extreme?",
     "audio_engineering.pdf", 2, "easy",
     "gain reaction speed; audible pumping"),
    ("When taming a harsh resonance, why is cutting usually better than "
     "boosting everything around it?",
     "audio_engineering.pdf", 3, "medium",
     "subtractive EQ is cleaner; narrow deep cuts have little footprint"),
    ("Why does a musician hear an echo of their own playing through the "
     "computer, and what sidesteps it?",
     "audio_engineering.pdf", 4, "medium",
     "buffer round-trip latency; hardware monitoring avoids it"),
    ("Why did mastering everything as loud as possible stop working on "
     "streaming platforms?",
     "audio_engineering.pdf", 5, "medium",
     "loudness normalization turns crushed mixes down"),

    # ---- robotics_control.pdf ----
    ("My controller holds a constant small error forever — which term is "
     "missing and what's its known failure mode?",
     "robotics_control.pdf", 1, "medium",
     "integral removes steady offset but winds up under saturation"),
    ("How does a state estimator behave while all its sensors briefly "
     "black out?",
     "robotics_control.pdf", 2, "medium",
     "prediction continues; covariance widens until measurements return"),
    ("What turns a geometric path into something a motor can actually "
     "follow?",
     "robotics_control.pdf", 3, "easy",
     "assign timestamps under velocity/acceleration ceilings"),
    ("After the arm hits its torque ceiling for a while, it overshoots "
     "wildly on recovery — what's the fix called?",
     "robotics_control.pdf", 4, "medium",
     "anti-windup feeds commanded-minus-achieved back to the integrator"),
    ("Why do inertial sensors need their bias re-estimated while the "
     "robot is running, not just at the factory?",
     "robotics_control.pdf", 5, "medium",
     "temperature drift moves bias terms continuously"),

    # ---- spreadsheet_guide.pdf ----
    ("I filled a formula down a column and half the results aimed at the "
     "wrong cells — what concept did I miss?",
     "spreadsheet_guide.pdf", 1, "easy",
     "relative vs absolute references shift on copy"),
    ("How do I see which raw rows produced one suspicious number in my "
     "cross-tab summary?",
     "spreadsheet_guide.pdf", 2, "medium",
     "pivot summary figures expand to their source rows"),
    ("My table lookup quietly returned the wrong row for an ID that "
     "wasn't present — why no error?",
     "spreadsheet_guide.pdf", 3, "medium",
     "approximate-match mode returns last key <= probe on sorted keys"),
    ("One formula now fills a whole block of cells, but it suddenly shows "
     "an error after I typed below it — what happened?",
     "spreadsheet_guide.pdf", 4, "medium",
     "spill blocked by an occupied target cell"),
    ("Two cells reference each other and the sheet still produces "
     "numbers — what mode makes that possible and what's the risk?",
     "spreadsheet_guide.pdf", 5, "medium",
     "iterative recalculation approximates fixed points, hides mistakes"),

    # ---- game_engines.pdf ----
    ("Players on high-refresh monitors jump farther than players on "
     "60 Hz — what loop design bug causes this?",
     "game_engines.pdf", 1, "medium",
     "simulation tied to render rate; fix with fixed-step + interpolation"),
    ("How do engines avoid running exact geometry tests on every pair of "
     "objects every frame?",
     "game_engines.pdf", 2, "easy",
     "broad phase prunes with bounding volumes; narrow phase on survivors"),
    ("Why do modern engines bolt small data pieces onto plain entity IDs "
     "instead of subclassing a GameObject?",
     "game_engines.pdf", 3, "medium",
     "composition + dense component arrays beat brittle inheritance"),
    ("What keeps an open world playable when the whole map can't fit in "
     "memory?",
     "game_engines.pdf", 4, "easy",
     "background streaming by predicted movement with per-frame budgets"),
    ("How can a multiplayer server verify a suspicious match result "
     "without trusting the client's claimed outcome?",
     "game_engines.pdf", 5, "medium",
     "deterministic replay re-simulates the recorded input stream"),

    # ---- bioinformatics_primer.pdf ----
    ("Why don't genome search tools run full dynamic programming against "
     "the whole database?",
     "bioinformatics_primer.pdf", 1, "medium",
     "quadratic cost; seed with exact short words, extend promising hits"),
    ("What makes long repeated stretches of a genome so hard to stitch "
     "together from short fragments?",
     "bioinformatics_primer.pdf", 2, "medium",
     "repeats longer than reads create ambiguous graph branches"),
    ("Why do variant callers output likelihoods instead of just saying "
     "'mutation here'?",
     "bioinformatics_primer.pdf", 3, "medium",
     "downstream analyses set their own thresholds over genotype "
     "likelihoods"),
    ("A sequencing read overlaps two similar transcripts — how is it "
     "counted?",
     "bioinformatics_primer.pdf", 4, "medium",
     "fractional assignment via an expectation procedure"),
    ("Why can't we just enumerate every possible species tree and pick "
     "the best?",
     "bioinformatics_primer.pdf", 5, "easy",
     "tree space grows super-exponentially; heuristic rearrangements"),

    # ---- api_design.pdf ----
    ("Which kinds of changes can I ship to a public interface without "
     "breaking a single caller?",
     "api_design.pdf", 1, "easy",
     "additive only: new optional fields, new endpoints"),
    ("Page three of my listing shows an item I already saw on page two — "
     "what pagination choice causes that?",
     "api_design.pdf", 2, "medium",
     "offset pagination drifts under concurrent inserts; cursors don't"),
    ("What two separable things should an error response tell a machine "
     "and a human?",
     "api_design.pdf", 3, "easy",
     "machine-readable class (retriable? whose fault?) + diagnosis"),
    ("Why do per-IP request quotas punish innocent users behind one "
     "office gateway?",
     "api_design.pdf", 4, "medium",
     "shared egress collapses address-keyed limits; key by identity"),
    ("My payment request timed out and I retried — what mechanism "
     "guarantees the customer isn't charged twice?",
     "api_design.pdf", 5, "medium",
     "idempotency key replays the first outcome verbatim"),

    # ---- 40 additional queries over the ORIGINAL 18 documents ----
    # arrays_guide
    ("Which indexing styles hand back freshly allocated data instead of a "
     "window onto the original?",
     "arrays_guide.pdf", 2, "medium",
     "fancy/boolean indexing gathers scattered elements into a copy"),
    ("When I mix a 32-bit float array with 64-bit integers, what rules "
     "decide the result's type?",
     "arrays_guide.pdf", 3, "easy",
     "promotion to smallest lossless type; scalars are weaker"),
    ("Why is transposing a large matrix instantaneous while summing along "
     "the first axis is slow?",
     "arrays_guide.pdf", 4, "hard",
     "transpose swaps strides without copying; against-stride traversal "
     "misses cache"),
    # dataframe_handbook
    ("What's the difference between keeping every left-hand row versus "
     "only rows present on both sides of a table match?",
     "dataframe_handbook.pdf", 1, "easy",
     "left join preserves + fills missing; inner keeps intersection"),
    ("How do I compute a per-group statistic but keep my table's original "
     "row order and length?",
     "dataframe_handbook.pdf", 2, "medium",
     "transform variants broadcast group results back to row positions"),
    ("Why does adding any column that touches an absent observation turn "
     "the whole result absent?",
     "dataframe_handbook.pdf", 3, "easy",
     "missing markers propagate through arithmetic unless skipped"),
    # optimizer_manual
    ("How does remembering an average of past gradients stop my loss from "
     "zigzagging?",
     "optimizer_manual.pdf", 2, "easy",
     "momentum compounds persistent directions, cancels oscillation"),
    ("My training exploded after one weird batch — what bound prevents a "
     "single update from ruining a run?",
     "optimizer_manual.pdf", 4, "easy",
     "gradient-norm clipping rescales while preserving direction"),
    ("Why do some schedules deliberately raise the learning rate again "
     "mid-training?",
     "optimizer_manual.pdf", 3, "medium",
     "cyclical schedules traverse between basins"),
    # training_pipeline
    ("How does a trainer guarantee that a crash mid-save never leaves a "
     "corrupt half-written checkpoint?",
     "training_pipeline.pdf", 1, "easy",
     "write to temp file then atomic rename"),
    ("Why does reduced-precision training keep one full-precision copy of "
     "everything anyway?",
     "training_pipeline.pdf", 3, "medium",
     "master weights accumulate updates; loss scaling guards small grads"),
    ("My accelerator sits idle between steps even though the model is "
     "huge — where's the usual bottleneck?",
     "training_pipeline.pdf", 5, "medium",
     "host preprocessing; prefetch batches on background workers"),
    # gpu_programming
    ("Why does an if/else inside my device code halve its speed even when "
     "both sides are cheap?",
     "gpu_programming.pdf", 1, "medium",
     "lockstep groups serialize divergent branches"),
    ("Neighboring threads read neighboring elements in one kernel and "
     "random ones in another — why the order-of-magnitude difference?",
     "gpu_programming.pdf", 2, "easy",
     "coalesced consecutive access merges into wide transactions"),
    ("How can using FEWER registers per thread make a kernel faster?",
     "gpu_programming.pdf", 4, "hard",
     "occupancy rises, more resident groups hide memory latency"),
    ("What lets data copies to the device proceed while a kernel is still "
     "running?",
     "gpu_programming.pdf", 5, "medium",
     "separate streams + pinned host buffers overlap transfer and compute"),
    # memory_management
    ("Why do high-churn servers allocate same-sized objects from a "
     "carved-up region instead of the general heap?",
     "memory_management.pdf", 1, "easy",
     "pool slots make alloc/free constant-time, no header overhead"),
    ("Plenty of free memory, yet large allocations fail — what's "
     "happening and what are the structural fixes?",
     "memory_management.pdf", 2, "easy",
     "fragmentation; compaction or size-class segregation"),
    ("Why do generational collectors scan the newest objects most often?",
     "memory_management.pdf", 4, "medium",
     "most objects die young; frequent nursery sweeps shrink pauses"),
    ("What allocation scheme makes 'free everything from this request' a "
     "single operation?",
     "memory_management.pdf", 5, "easy",
     "arena: bump-pointer allocation, release the phase wholesale"),
    # database_internals
    ("Why does every extra secondary index slow my inserts down?",
     "database_internals.pdf", 1, "medium",
     "each index maintains sorted nodes; splits cascade on writes"),
    ("Why are my query plans suddenly terrible after a huge bulk load?",
     "database_internals.pdf", 3, "medium",
     "stale statistics produce wrong row estimates"),
    ("How can a long report query run while writers keep updating the "
     "same rows, without locks?",
     "database_internals.pdf", 4, "easy",
     "MVCC: readers see their snapshot's versions"),
    # networking_guide
    ("How does a sender discover how fast it can push data without being "
     "told a rate?",
     "networking_guide.pdf", 1, "easy",
     "grow the window until congestion signals, then back off"),
    ("Why add randomness to retry delays instead of plain doubling?",
     "networking_guide.pdf", 2, "easy",
     "jitter prevents synchronized herds hammering recovery"),
    ("What handshake property protects last year's recorded traffic after "
     "the server's key leaks today?",
     "networking_guide.pdf", 5, "medium",
     "forward secrecy via ephemeral key exchange"),
    # text_processing
    ("How do subword vocabularies guarantee that ANY string can be "
     "encoded?",
     "text_processing.pdf", 1, "easy",
     "single characters remain in the vocabulary as a floor"),
    ("Why do search systems accept a word-chopper that sometimes merges "
     "unrelated words?",
     "text_processing.pdf", 2, "medium",
     "stemming's speed is worth occasional collisions vs lemmatization"),
    ("Two strings look identical on screen but compare unequal byte-wise "
     "— what preprocessing fixes this?",
     "text_processing.pdf", 5, "easy",
     "unicode normalization to canonical form; case folding"),
    # search_engines
    ("What data layout answers 'which documents contain BOTH words' "
     "without reading the corpus?",
     "search_engines.pdf", 1, "easy",
     "inverted index; intersect sorted postings with skips"),
    ("Why doesn't a 10,000-word document automatically outrank a "
     "200-word one that mentions my terms equally often?",
     "search_engines.pdf", 2, "medium",
     "length normalization in term-weighted ranking"),
    ("How do engines avoid indexing the same page a thousand times under "
     "different session URLs?",
     "search_engines.pdf", 3, "medium",
     "canonicalization + content fingerprinting in the crawler"),
    ("My one-word query misses obviously relevant pages that phrase it "
     "differently — what technique closes that gap?",
     "search_engines.pdf", 5, "easy",
     "query expansion / pseudo-relevance feedback"),
    # neural_networks
    ("Why is computing gradients for a million parameters barely more "
     "expensive than one forward pass?",
     "neural_networks.pdf", 1, "medium",
     "reverse-mode chain rule reuses activations in one sweep"),
    ("What architectural trick makes a vision layer respond identically "
     "to a cat wherever it appears in the frame?",
     "neural_networks.pdf", 3, "medium",
     "weight sharing: same filters at every position"),
    ("Why are randomly deleted activations during training said to train "
     "an ensemble?",
     "neural_networks.pdf", 4, "medium",
     "dropout samples subnetworks; inference scales the full net"),
    # probability_primer
    ("A vivid positive test result convinced me I'm sick — what number am "
     "I neglecting?",
     "probability_primer.pdf", 1, "medium",
     "the prior/base rate in Bayesian updating"),
    ("Why do histograms of accumulated measurement noise look like a bell "
     "no matter the noise source?",
     "probability_primer.pdf", 2, "easy",
     "central limit theorem for sums of small independent effects"),
    ("I ran twenty significance tests and celebrated the one that passed "
     "— what did I just do wrong?",
     "probability_primer.pdf", 4, "easy",
     "multiple comparisons inflate false alarms"),
    # linear_algebra
    ("What cheap iterative trick finds a matrix's most-stretched "
     "direction without any factorization?",
     "linear_algebra.pdf", 2, "easy",
     "power iteration: multiply and renormalize"),
    ("Why does forming the normal equations lose precision that an "
     "orthogonal method keeps?",
     "linear_algebra.pdf", 4, "hard",
     "normal equations square the condition number"),
    # signal_processing / compilers / concurrency / storage / image
    ("What identity lets me filter a signal by multiplying spectra "
     "instead of sliding a window?",
     "signal_processing.pdf", 4, "easy",
     "convolution theorem: time convolution = frequency multiplication"),
    ("Why does analyzing a short slice of a long tone smear its frequency "
     "across neighbors, and what's the standard remedy?",
     "signal_processing.pdf", 5, "medium",
     "leakage from implicit rectangle; tapered windows"),
]

# Ten additional DEV rejection queries: plausible technical questions with
# no answering content anywhere in the corpus or distractors. Authored
# fresh (NOT drawn from training/ood.py's synthesized junk template banks,
# which are mechanism-informed for the judge — advisor r2 note).
REJECTION_QUERIES_V3 = [
    "What is the default time-to-live of a DNS A record served by BIND?",
    "How do I configure Kubernetes pod eviction thresholds for memory "
    "pressure?",
    "What does the Rust borrow checker do when two mutable references "
    "overlap?",
    "Which opcode does the JVM use for invoking interface methods?",
    "What's the maximum payload size of a LoRaWAN uplink frame?",
    "How does the Ethereum virtual machine price storage writes in gas?",
    "What whitening filter does the LIGO pipeline apply before matched "
    "filtering?",
    "How do I tune the PID gains on a Prusa 3D printer's hotend?",
    "What ISO setting minimizes rolling-shutter artifacts on a mirrorless "
    "camera?",
    "Which soil pH range do highbush blueberries tolerate?",
]

