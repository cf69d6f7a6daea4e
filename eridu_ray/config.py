"""Pipeline configuration.

The reference passes config through ~25 environment variables written by the
CLI and read at import time (reference: eridu/cli/main.py:477-507,
eridu/train/fine_tune_sbert.py:54-117).  The new engine replaces that channel
with one explicit dataclass handed to pipeline builders; every random /
hashed quantity (minhash permutations, band salts, synthetic mutations) is
derived from the single ``seed`` so runs are reproducible at any parallelism.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

#: Fingerprint-algorithm version, folded into config_hash so checkpoints
#: written by an older kernel are invalidated even when no config FIELD
#: changed.  Bump whenever a change to kernels/ or stages/signatures.py
#: alters any persisted signature/fingerprint (minhash perms, simhash,
#: winnow/CDC/repetition markers, verify-set projection) — e.g. round 3's
#: repetitive-span repetition markers changed winnow output while every
#: config field stayed identical, so a pre-change "signatures" checkpoint
#: would have silently resumed under the new code.
KERNEL_VERSION = 3


@dataclass(frozen=True)
class PipelineConfig:
    # --- determinism (reference seeds 31337/42: fine_tune_sbert.py:54-58) ---
    seed: int = 31337

    # --- signature config (authoritative per BASELINE.md target table) ---
    shingle_k: int = 5          # char-5-gram shingles
    num_perms: int = 128        # 128-permutation MinHash
    lsh_bands: int = 16         # b=16
    lsh_rows: int = 8           # r=8  (b*r must equal num_perms)
    simhash_bits: int = 64      # 64-bit SimHash near-exact fallback
    verify_bits: int = 32       # retained verify-set element width: the
                                # exact-Jaccard stage (and its shared
                                # ground-truth kernel) runs on 32-bit
                                # projected shingle sets — half the blob
                                # traffic of u64 at ~1e-6 J perturbation
    simhash_max_hamming: int = 3

    # --- thresholds ---
    dup_jaccard: float = 0.80       # exact-Jaccard >= this => duplicate edge
    borderline_jaccard: float = 0.60  # [borderline, dup) => scorer refinement
    scorer_threshold: float = 0.90    # stub/SBERT cosine >= this => edge
    use_scorer_edges: bool = True     # borderline scorer edges in the flagship
                                      # (semantic: changes the edge set, so it
                                      # participates in config_hash — a resume
                                      # with the flag flipped must recompute)

    url_sim_weight: float = 0.0     # blend weight of url-trigram fuzzy
                                    # similarity in the borderline scorer:
                                    # sim = (1-w)*content + w*url_jaccard
                                    # over canonicalized urls (north-star
                                    # "title/url fuzzy matching" clause).
                                    # Semantic when nonzero (changes the
                                    # scorer edge set), so it stays in
                                    # config_hash; 0.0 = content-only,
                                    # byte-identical to the pre-knob
                                    # flagship, and the recall gates run
                                    # at this default.

    # --- candidate prefilter (scale: cuts the verify-shuffle traffic) ---
    # pairs whose byte-sketch MinHash estimate is below
    # borderline_jaccard - prefilter_margin are dropped BEFORE the
    # shingle-blob joins; winnow (span) candidates are exempt.  margin set
    # ~3 sigma of the 128-slot estimate at J=borderline (sigma ~0.044)
    prefilter_margin: float = 0.15

    # --- substring (long shared span) stage ---
    winnow_window: int = 64     # guarantee: shared span >= window+k-1 chars
    min_shared_span: int = 200  # chars; spans >= this create substring edges
    winnow_min_hits: int = 2    # winnow-ONLY pairs must share >= this many
                                # distinct fingerprints: a true span >=
                                # 2*window+k-1 = 132 chars < min_shared_span
                                # guarantees >= 2, while common-vocab
                                # single-fp collisions (the measured junk-
                                # pair storm on dense-vocab corpora) die
                                # before the blob-carrying verify shuffle
    winnow_est_min: float = 0.42  # ...unless the pair's 32-slot sketch
                                # estimate reaches near the borderline
                                # window (borderline - 2 sigma(32 slots)):
                                # borderline near-dups caught by a single
                                # fingerprint survive, J~0 junk does not

    # --- skew / scale knobs ---
    band_group_cap: int = 256   # max docs per LSH bucket before star-fallback
    winnow_group_cap: int = 32  # span buckets: larger = boilerplate, star it
    max_cc_rounds: int = 16     # label propagation hard cap (log-diameter)
    batch_size: int = 2048      # rows per map_batches batch in hot stages
    scorer_batch_size: int = 1024
    scorer_concurrency: tuple = (1, 8)  # actor-pool size (min, max)
    num_partitions: int = 32    # hash-join / shuffle partition count
    bucket_partitions: int = 128  # pid buckets for partitioned pair
                                # emission (group-count amortization);
                                # layout knob, excluded from config_hash
    verify_strategy: str = "auto"  # "auto" = broadcast when the verify
                                # blob table fits the per-node budget
                                # below, else reduce;
                                # "reduce" = union+sort-groupby join
                                # with fused Jaccard (no join-aggregator
                                # actors, blob shipped once per node);
                                # "broadcast" = blob index ray.put once,
                                # dedup+verify fused into the single
                                # pair-pid groupby (small regime: both
                                # verify shuffle passes vanish);
                                # "acero" = two hash joins + jaccard map.
                                # Layout knob: results are identical
                                # (asserted in tests), so it is excluded
                                # from config_hash.
    verify_broadcast_max_bytes: int = 1 << 32  # "auto" takes the
                                # broadcast verify path while the
                                # uint32 verify-blob table is <= this
                                # (4 GB: shipped ONCE per node via the
                                # object store, zero-copy to every
                                # worker on it — a small slice of a
                                # 128 GB node).  The 10^12-doc regime
                                # exceeds it by ~3 orders of magnitude
                                # -> reduce path.
    cc_partitions: int = 8      # CC-round joins: label tables are far
                                # smaller than the corpus; fewer partitions
                                # = fewer aggregator actors per round
    cc_driver_max_edges: int = 5_000_000  # below this, exact union-find on
                                # the driver (16 B/edge); above, distributed
                                # label propagation

    span_strategy: str = "hash"  # span-verify kernel: "hash" = rolling-
                                # hash binary search (length only,
                                # ~6x faster per pair); "sa" = true
                                # generalized suffix array (collision-
                                # free, also yields span offsets).
                                # Both return the exact longest-shared-
                                # run length (identity asserted in
                                # tests), so it is a layout knob
                                # excluded from config_hash.

    disable_op_reservation: bool = True  # run_dedup scope: turn OFF Ray
                                # Data's per-operator object-store
                                # reservation (ReservationOpResource-
                                # Allocator) for the pipeline's heavy
                                # stages.  The allocator slices one
                                # budget across the ~25 operators of
                                # the chained all-to-all verify DAG and
                                # LIVELOCKS once several barrier queues
                                # hold GBs at once (measured at 633k
                                # fat pages: frozen 20+ min under both
                                # shuffle strategies; off -> 138 s, and
                                # 9-13% faster at every smaller size —
                                # BASELINE.md).  Spilling still bounds
                                # memory; the caller's setting is
                                # restored on return.  Layout knob,
                                # excluded from config_hash.

    membership_broadcast_max_nodes: int = 200_000_000  # incremental
                                # fold: the prior-corpus node-id
                                # membership used to drop prior-prior
                                # pairs / filter new rows ships as ONE
                                # ray.put sorted int64 array while the
                                # prior corpus is <= this many docs
                                # (8 B/doc -> 1.6 GB at the default, a
                                # small slice of a 128 GB node).  Above
                                # it (the 10^12-prior-doc regime, where
                                # the array would be ~8 TB) the fold
                                # switches to hash-partitioned semi/
                                # anti joins on node_id — no driver or
                                # per-worker O(prior) artifact at all.
                                # Both paths produce byte-identical
                                # labels (forced-path gate in
                                # tests/test_incremental.py); layout
                                # knob, excluded from config_hash.

    incremental_prune_state: bool = True  # v3 fold reads: prune the
                                # persisted prior explode partitions to
                                # buckets a NEW key touches (key column
                                # scan + row-group selection) before the
                                # pair kernel.  Provably label-identical
                                # (untouched buckets emit only prior-
                                # prior pairs, which skip_pairs_both_in
                                # drops regardless), so it is a layout/
                                # perf knob excluded from config_hash;
                                # False restores the full v2 read.

    # --- checkpointing ---
    checkpoint_dir: str | None = None  # None => no checkpoints

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perms ({self.num_perms})"
            )

    def config_hash(self) -> str:
        """Stable hash of everything that affects results (not layout knobs).

        Used to validate checkpoints: a checkpoint written under a different
        semantic config must not be resumed from.
        """
        d = asdict(self)
        # layout/perf knobs don't change results
        for k in ("batch_size", "scorer_batch_size", "scorer_concurrency",
                  "num_partitions", "cc_partitions", "cc_driver_max_edges",
                  "checkpoint_dir", "verify_strategy",
                  "verify_broadcast_max_bytes", "bucket_partitions",
                  "incremental_prune_state", "span_strategy",
                  "disable_op_reservation",
                  "membership_broadcast_max_nodes"):
            d.pop(k)
        d["kernel_version"] = KERNEL_VERSION
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
