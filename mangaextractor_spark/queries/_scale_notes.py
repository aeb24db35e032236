"""Shared scale knobs + the hot-key playbook for corpus-frequency stats.

This repo shipped the same scale hazard twice (round-3 verdict:
``bm25_topk`` and ``repeated_ngram_stats``) — computing a per-key
document frequency with ``F.count(...).over(Window.partitionBy(key))``.
That window carries EVERY row of a key into ONE task: windows get no
partial (map-side) aggregation and AQE's skew handling only splits
join/aggregate exchanges, never window partitions. At sf0.1 it is
invisible; at 100 TB one boilerplate 8-gram or one corpus-frequent
query term pins the whole stage on a single straggler task.

The pattern to use instead (both call sites now do):

1. ``base.persist()`` the frame the frequency is computed FROM. A
   joined-back/broadcast dimension otherwise re-executes the whole
   upstream subtree once per build (measured round-2 lesson — broadcast
   builds and probe sides do not share scan results without a cache).
2. ``df = base.groupBy(key).agg(...)`` — a real aggregate, so partial
   aggregation combines map-side and no task ever sees more than its
   share of any key.
3. Join it back:
   - ``F.broadcast(df)`` when the key domain is bounded (query
     vocabulary: |terms| rows) — zero extra shuffle;
   - a plain equi-join when the domain is corpus-sized (gram hashes) —
     shuffles, but AQE CAN skew-split an equi-join exchange, which it
     can never do for a window.

Caps that bound fan-out before it exists (cheaper than any skew fix —
drop the hot keys at the source, mirrored in the SQL oracle so the
driver compare still matches):
"""

from __future__ import annotations

# ngram_jaccard_pairs: shingles in more than this many documents are
# dropped from posting lists before the pair join (stop-shingle rule;
# a shingle shared by the whole corpus generates O(n^2) candidate
# pairs and carries no dedup signal). Mirrored in the oracle CTE.
POSTING_CAP = 64

# bm25_topk: corpus-frequent query terms are kept (their rational idf
# ~0 already neutralizes them) but their df MUST come from a
# groupBy+broadcast join-back, never a window — see module docstring.
# A production deployment would additionally stop-list terms with
# df/N above this fraction (WAND-style impact pruning); on the
# synthetic ~30-word vocabulary this would degenerately empty the
# result, so it is documented, not applied.
STOP_TERM_DF_FRAC = 0.5

# repeated_ngram_stats: gram df is only consumed as the predicate
# df >= 2, so the join-back dimension is (h, is_rep) — key + boolean,
# the smallest possible payload for the corpus-sized equi-join.
REPEATED_MIN_DF = 2

# The stop-key rule transplanted to SKETCH space: simhash_hamming_pairs
# drops band buckets holding more than this many docs before pairing
# (dedup.SIMHASH_BAND_CAP mirrors this value). Same reasoning as
# POSTING_CAP — a sketch value shared by a viral boilerplate family
# generates O(n^2) candidates and carries no near-dup signal; the cap
# is mirrored in the SQL oracle so the driver compare still matches.
# Related: bloom_decontamination needs NO cap because the probe is a
# constant-size broadcast map lookup — fan-out never exists.
SKETCH_BUCKET_CAP = 64

# sequence_packing / packed_sequences: the packing prefix sum is the
# one WINDOW this repo keeps — its partition key is a HASH BUCKET whose
# population is capped by construction (bucket count is the explicit
# parallelism knob), never a data-dependent key with unbounded fan-out.
# That is the rule: windows are fine when the partition size is chosen
# by the operator, and forbidden when the data chooses it. At 100 TB
# size buckets to ~64k docs each: _packing_frame(..., n_buckets=N) and
# stream_sequence_packing(..., n_buckets=N) expose the knob as a real
# parameter (round-4 verdict item 3); corpus_prep.PACK_BUCKETS=8 is
# only the default the registered sf-fixture query (and its oracle SQL)
# pins. tests/test_corpus_prep.py::test_packing_n_buckets_knob packs
# the same corpus at 4 and 16 buckets and checks the boundary rule is
# invariant.

# Top-k ranking is the THIRD incarnation of the window pin: row_number
# over Window.partitionBy(query) carries every candidate of a query on
# one task (corpus-sized for brute-force similarity / common BM25
# terms). Fix: queries/_topk.py topk_per_group — Arrow-batched
# per-PARTITION top-k with the same fully-tie-broken total order, then
# the exact window over <= k * n_partitions survivors. Results are
# bit-identical; plan-asserted in tests (MapInPandas feeds the Window).

# Broadcast boundedness rule (the round-4 dedup_embedding_cosine
# lesson, generalized): F.broadcast is only legal on frames whose row
# count is bounded by CONSTRUCTION (a query batch, a codebook, a probe
# list, one register row) — never on data-scaled intermediates. Two
# knobs keep "constant" sets constant as the corpus grows:
# - IVF centroids (similarity.CENT_MOD, shared by pq.py): cells are
#   vec_id % CENT_MOD == 0, so |cells| = n / CENT_MOD. Size CENT_MOD
#   proportionally to the corpus so cells stay a fixed nlist (e.g.
#   65k); the oracle mirrors whatever modulus is chosen. Left at the
#   fixture default, the centroid broadcast would scale as n/31 — the
#   knob, not the plan shape, is what makes it nlist-bounded.
# - PQ codebook (pq.CB_MOD/CB_MAX): already capped by CB_MAX, bounded
#   at any scale.

# Candidate generation has THREE tiers, by what they guarantee
# (round-5 closing; pick per use case, all three live in the repo):
# 1. CAPPED generators (ngram_jaccard_pairs POSTING_CAP, the LSH band
#    SKETCH_BUCKET_CAP): bounded cost at any scale, recall is lost
#    exactly at the documented caps and the oracle mirrors them.
# 2. PROBABILISTIC generators (MinHash/SimHash banding): bounded cost,
#    recall is a tunable probability (band/row trade), calibration
#    measured by minhash_jaccard_accuracy.
# 3. LOSSLESS pruning (jaccard_prefix_join's prefix filter): recall
#    1.0 by THEOREM — two sets with J >= t must share a token in their
#    first n - ceil(t*n) + 1 tokens under any common global order, so
#    the brute-force oracle's equal output proves the filter. Cost is
#    data-dependent (hot prefix tokens fan out; rarest-first ordering
#    minimizes it, AQE skew-split handles the residue), which is the
#    price of exactness: use tier 3 when missing a pair is not
#    acceptable, tiers 1-2 when the dedup budget is fixed.
# Integer-exactness corollary used throughout: a ratio threshold never
# needs floats — J >= 1/2 is 3c >= na+nb, "above segment average" is
# bal*cnt > sum, a majority share is k*part > total. Cross-multiplied
# integer predicates are bit-stable across engines by construction.

# Round-5 final additions, same taxonomy:
# - VOCAB-SIZED FRONTIER (bpe_fit, token_pmi_pairs, vocab_coverage):
#   one corpus scan reduces to a word/pair-frequency table bounded by
#   the vocabulary, and every iteration/join after that touches only
#   vocab-sized frames. Iterative ops localCheckpoint the small frame
#   per round (kmeans_fit's rule) so plan depth stays linear in rounds
#   and the corpus is never rescanned.
# - DIMENSION-BOUNDED MATRIX JOINS (source_overlap_matrix): a self-join
#   on a corpus-sized key is safe when the VALUE side is a rollup
#   dimension — fan-out per key is <= C(S,2) where S is the dimension
#   cardinality, i.e. bounded by the output matrix itself. With an
#   unbounded dimension (raw domains), elect top-S by volume first.
# - INTERVAL-UNION WINDOWS (exact_substring_spans): gaps-and-islands
#   over positions partitions by doc_id — bounded by one document's
#   length, the same construction-bounded class as the packing bucket
#   window. The df side stays groupBy + join-back like
#   repeated_ngram_stats.
# - BIGINT PRODUCT HEADROOM (token_pmi_pairs lift = cxy*N^2/(M*cx*cy)):
#   exact-integer cross-products overflow int64 when N approaches 2^21
#   tokens x top counts; at real scale compute the products in
#   DECIMAL(38,0) (both engines support it exactly) before the single
#   double division. The predicate form (cross-multiplied comparisons)
#   has the same headroom rule.

# Fourth-session addition — the MULTIMODAL COST MODEL (mm_packing):
# - Packing/batching over interleaved text+image docs must price image
#   spans in patch tokens (ceil(w/P)*ceil(h/P) + sentinels), not rows:
#   one hi-res image outweighs most documents' text, so word-count
#   packing misbudgets sequences by the image-token share.
# - The per-doc cost stays BOUNDED because geometry is capped (the
#   resolution ceiling caps the patch grid), so the packing bucket
#   window keeps the construction-bounded property of sequence_packing
#   — a cost model change, not a new shuffle shape.
# - Within-doc positions (which sequence an image lands in) are a
#   prefix over the doc's OWN span-cost array — array HOFs, map-side,
#   O(k^2) in spans-per-doc with k bounded by the document itself;
#   never a corpus window. The manifest rollups group on
#   (bucket, seq_id), cardinality total_tokens/SEQ_LEN, uniformly
#   spread by construction.
# - Aspect bucketing's nearest-ratio argmin is exact integer math:
#   |w/h - bw/bh| comparisons cross-multiply onto a common lcm
#   denominator (the h factor cancels), and the bucket index rides the
#   low bits of the scaled score for a single-BIGINT argmin with a
#   deterministic tie-break — the same integer-exactness corollary as
#   the ratio thresholds above.
