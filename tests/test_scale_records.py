"""Encode SCALE.md's sf1 scaling argument as assertions (r7 verdict
#5): the claim "blocked operators stay sub-quadratic, map-only stays
~input-linear, the star joins' broadcast→shuffle transition at sf1 is
the correct plan" was prose; this test reads the standing
PLANMETRICS.json artifact (bench.py emits deterministic per-query
input/shuffle record counts at sf0.1 plus an sf1 tail) and asserts the
ratio CLASS of every sf1-tail query.

Classes (every sf1-tail query MUST be classified — adding a query to
bench.py's SF1_TAIL without classifying it here fails loudly):

- LINEAR: shuffle records grow ~with input (digest/doc-keyed exchanges:
  exact dedup, map-only text ops whose one exchange is result
  delivery).
- BLOCKED: band/bucket-blocked self-joins. Growth may exceed linear
  (a denser corpus has more REAL band collisions) but must stay far
  below the quadratic class — the 100 TB argument is that blocking,
  not corpus size, bounds the join.
- CONSTANT: result-bounded exchanges (top-k similarity ships k rows
  per query regardless of corpus size; the corpus never shuffles).
- PLAN_TRANSITION: star joins whose small side outgrows the broadcast
  threshold at sf1 — AQE correctly switches to a shuffle join, so
  shuffle records jump from ~result-size to ~input-size. The invariant
  that survives the transition: the exchange carries at most O(input),
  never O(input²) — record ratios must be read against the plan, not
  scalar-gated (SCALE.md "sf1 scaling evidence").

Runs only when the artifact carries an sf1 section (bench.py --sf1 or
a driver round); otherwise skips — correctness gates don't produce it.
"""

from __future__ import annotations

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.environ.get(
    "PLANMETRICS_PATH", os.path.join(ROOT, "PLANMETRICS.json"))

LINEAR = {
    "dedup_exact", "text_quality",
    # r8 wave 2. perplexity: token-keyed counts + doc-keyed NLL agg,
    # both ~input. pmi: gram-keyed counts — observed SUB-linear (2.35×
    # shuffle on 10× input: the distinct-gram vocabulary saturates).
    # hybrid_rrf: the only data-scaled exchange is util.spread()'s
    # parallelism-floor repartition inside the BM25 leg (observed 8.6×
    # on 10× input) — linear by definition, and a no-op on a real
    # cluster where the scan already has enough partitions; the
    # algorithmic exchanges (stats row, 2×pool fusion) are constant.
    "text_perplexity_buckets", "corpus_pmi_top_pairs",
    "retrieval_hybrid_rrf",
    # r9: overlap matrix (full + incremental). The dominant exchange is
    # the (group, shingle) distinct's map-side shuffle of the shingle
    # stream (~input-scaled; measured 9.3-9.4× on 10× input); the
    # shingle-keyed pair join after the distinct is bounded per key by
    # the GROUP count, so it can never go quadratic in the corpus.
    "corpus_overlap_matrix", "corpus_overlap_incremental",
}
# max allowed shuffle-growth / input-growth factor per blocked operator:
# r6→r7 observed 1.4–2.0× (real collisions in a denser corpus); 5× is
# far below the quadratic class (which would be ~input-ratio×, i.e. 10×
# here) while still failing on a pathological blow-up.
BLOCKED = {
    "dedup_minhash_lsh": 5.0,
    # the capped variant must grow no faster than the uncapped one —
    # the cap only ever removes candidate-join work
    "dedup_minhash_capped": 5.0,
    # r9 media near-dup: banded Hamming self-joins. Measured 1.3×/1.7×
    # over input growth at sf1 — the excess over linear is REAL pair
    # rows (the sf1 synthesizer duplicates texts ~10×, squaring
    # dup-group sizes), exactly the growth banding bounds.
    "dedup_image_phash": 5.0,
    "dedup_audio_fingerprint": 5.0,
    # r10: the incremental batch×corpus media forms (batch = every 5th
    # item, so the batch grows WITH the corpus here — shuffle tracks the
    # batch-side signature stream plus real cross-pair density, same
    # bound as the self-join forms)
    "dedup_image_phash_incremental": 5.0,
    "dedup_audio_fingerprint_incremental": 5.0,
    # r10: frame-hash Jaccard — pair volume grows with real cross-video
    # frame duplication, bounded by the co-frame blocking
    "dedup_video_framehash": 5.0,
    # r11 (r10 verdict #3): the from-store forms — store build (linear
    # ingest) + decode-free banded pairing. Measured 10.2×/10.8× shuffle
    # on 10.0× input (image/minhash) — the store adds no superlinear
    # exchange.
    "dedup_image_phash_from_store": 5.0,
    "dedup_minhash_incremental_from_store": 5.0,
    # store-read overlap: input grows SUB-linearly (2.9× on 10× corpus —
    # the distinct group-shingle vocabulary saturates, same effect as
    # corpus_pmi) while the shingle-keyed pair join tracks real co-group
    # density (measured 5.6× shuffle = 1.9× input growth)
    "corpus_overlap_from_store": 5.0,
    # incremental frame-hash Jaccard: batch×corpus co-frame join,
    # measured 10.7× shuffle on 9.8× input
    "dedup_video_framehash_incremental": 5.0,
    # r11 composed entries: decode → pairs → connected components →
    # retention. Input records grow with PAIR volume, not corpus (the
    # component loop re-reads the checkpointed edge list every
    # iteration, and the sf1 synthesizer's duplicate density squares
    # group sizes: measured ~64× input, ~80×/~59× shuffle — ratio
    # 1.2×/0.9× of input growth). The invariant that matters at 100 TB:
    # shuffle NEVER outruns the pair-bounded input stream — the banded
    # blocking (image) / cell blocking (SemDeDup, cells scale with the
    # corpus via _semantic_fit_cells) caps pair volume itself.
    "pipeline_media_dedup": 5.0,
    "dedup_embedding_semantic_fit": 5.0,
    # r12 (r11 verdict #4): the semantic family's remaining forms at
    # production shape (corpus-scaled fitted cells — mean cell ~250, so
    # co-cell candidates price by the batch, not the corpus²).
    # incremental: batch = every 5th vector, so the batch grows WITH
    # the corpus here — the co-cell join tracks batch-side volume plus
    # real cross-pair density, the same bound as the media incremental
    # rows. from-store: linear store build (ingest + map-only
    # assignment) + the same co-cell pairing reading cells back instead
    # of re-assigning. streaming replay: three ordered accept batches —
    # each batch's exchange is its self-check plus the batch×accepted
    # co-cell join, so the total stays pair-bounded like the batch
    # forms.
    "dedup_embedding_semantic_incremental_scaled": 5.0,
    "dedup_embedding_semantic_from_store_scaled": 5.0,
    "streaming_semantic_replay": 5.0,
    # r13: the composed corpus build (exact → minhash → Gopher →
    # semantic → decontamination → mixture → packing). Every pairing
    # stage is blocked or capped: minhash bands bound the candidate
    # join, the semantic stage's pinned cells carry the hot-cell cap
    # (max_cell_size=250 — over-cap cells emit no pairs, the production
    # guard for fixed centroid sets), the contamination join is
    # probe-bounded, packing is partition-local. Shuffle must track the
    # shingle/signature streams, never corpus².
    "pipeline_llm_corpus_packed": 5.0,
}
CONSTANT = {"similarity_topk_brute"}
PLAN_TRANSITION = {"sql_join_top_customers", "sql_join_region_revenue"}


def _load():
    if not os.path.exists(ARTIFACT):
        pytest.skip(f"no {ARTIFACT}")
    d = json.load(open(ARTIFACT))
    base, sf1 = d.get("plan_metrics") or {}, d.get("sf1_plan_metrics") or {}
    if not sf1:
        pytest.skip("artifact has no sf1 section (run bench.py with the "
                    "sf1 tail enabled)")
    return base, sf1, bool(d.get("sf1_carried_from_previous_run"))


def test_every_sf1_query_is_classified():
    """Sync against bench.py's SOURCE list, not the artifact: dropping
    a query from SF1_TAIL while it stays classified here (or adding one
    without a class) fails loudly even before the next bench run."""
    import bench

    classified = LINEAR | set(BLOCKED) | CONSTANT | PLAN_TRANSITION
    tail = set(bench.SF1_TAIL)
    assert classified == tail, (
        f"unclassified sf1-tail queries: {sorted(tail - classified)}; "
        f"classified-but-dropped: {sorted(classified - tail)} — keep "
        "tests/test_scale_records.py and bench.py SF1_TAIL in sync")
    _, sf1, _ = _load()
    assert set(sf1) <= tail, (
        f"artifact sf1 section has queries outside SF1_TAIL: "
        f"{sorted(set(sf1) - tail)}")


def _ratios(base, sf1, name, carried):
    a, b = base.get(name), sf1.get(name)
    if a is None or b is None:
        # A classified query may legitimately be absent only when the
        # artifact's sf1 sections were CARRIED FORWARD from a previous
        # run (bench.py marks that) — the query was added to the tail
        # and the carried sections predate it. A FRESH artifact missing
        # a classified query means bench dropped it silently: fail.
        if carried:
            pytest.skip(f"{name} not in the carried-forward sf1 "
                        "sections (pending a successful sf1 bench run)")
        raise AssertionError(
            f"{name} is classified and in SF1_TAIL but missing from a "
            f"FRESH artifact (base={a is not None}, sf1={b is not None})"
            " — bench.py dropped it without marking carry-forward")
    in_ratio = b["input_records"] / max(a["input_records"], 1)
    sh_ratio = (b["shuffle_write_records"]
                / max(a["shuffle_write_records"], 1))
    return in_ratio, sh_ratio, a, b


@pytest.mark.parametrize("name", sorted(LINEAR))
def test_linear_operators_scale_with_input(name):
    base, sf1, carried = _load()
    in_ratio, sh_ratio, _, _ = _ratios(base, sf1, name, carried)
    assert 5 <= in_ratio <= 15, (name, in_ratio)
    # shuffle growth within 1.5× of input growth either way
    assert sh_ratio <= in_ratio * 1.5, (
        f"{name}: shuffle grew {sh_ratio:.1f}× on {in_ratio:.1f}× input "
        "— a linear-class operator regressed")


@pytest.mark.parametrize("name", sorted(BLOCKED))
def test_blocked_joins_stay_subquadratic(name):
    base, sf1, carried = _load()
    in_ratio, sh_ratio, _, _ = _ratios(base, sf1, name, carried)
    cap = BLOCKED[name]
    assert sh_ratio <= in_ratio * cap, (
        f"{name}: shuffle grew {sh_ratio:.1f}× on {in_ratio:.1f}× input "
        f"(cap {cap}× input growth) — blocking is no longer bounding "
        "the join")


@pytest.mark.parametrize("name", sorted(CONSTANT))
def test_result_bounded_exchanges_stay_flat(name):
    base, sf1, carried = _load()
    _, sh_ratio, a, b = _ratios(base, sf1, name, carried)
    assert sh_ratio <= 1.5 and b["shuffle_write_records"] <= 10_000, (
        f"{name}: exchange records {a['shuffle_write_records']} → "
        f"{b['shuffle_write_records']} — the corpus is shuffling")


@pytest.mark.parametrize("name", sorted(PLAN_TRANSITION))
def test_plan_transition_joins_bounded_by_input(name):
    base, sf1, carried = _load()
    _, _, _, b = _ratios(base, sf1, name, carried)
    # Post-transition the fact side crosses the exchange ~once; allow
    # 2× for multi-stage shuffles (join + agg), reject anything near
    # input². The sf0.1 side is intentionally unconstrained — broadcast
    # plans ship only result rows there.
    assert b["shuffle_write_records"] <= 2 * b["input_records"], (
        f"{name}: sf1 shuffle {b['shuffle_write_records']} exceeds 2× "
        f"input {b['input_records']} — more than a plan transition")


def test_anchor_subset_is_the_r05_headline_set():
    """bench.ANCHOR_SUBSET must stay exactly BENCH_r05's headline query
    set (the cross-round wall anchor) and remain a subset of the current
    headline set, so `anchor_subset_sec` keeps meaning the same
    computation every round."""
    import bench

    assert set(bench.ANCHOR_SUBSET) <= set(bench.BENCH_QUERIES)
    r05 = os.path.join(ROOT, "BENCH_r05.json")
    if not os.path.exists(r05):
        pytest.skip("no BENCH_r05.json")
    parsed = json.load(open(r05)).get("parsed") or {}
    assert set(bench.ANCHOR_SUBSET) == set(parsed.get("queries") or [])


def test_carry_sf1_evidence_on_partial_run():
    """r8 review find: a query-3 crash used to leave a 2-entry sf1
    section in place, clobbering the prior complete evidence and
    turning this gate red — partial runs must carry the previous
    sections forward, marked, with the partial attempt stashed."""
    import bench

    tail = ["q1", "q2", "q3"]
    prev = {"sf1_tail_sec": {"q1": 1.0, "q2": 2.0, "q3": 3.0},
            "sf1_plan_metrics": {q: {"input_records": 1} for q in tail}}
    # partial current run (crashed after q1)
    payload = {"sf1_tail_sec": {"q1": 0.9, "error": "boom"},
               "sf1_plan_metrics": {"q1": {"input_records": 2}}}
    out = bench._carry_sf1_evidence(payload, prev, tail)
    assert out["sf1_carried_from_previous_run"] is True
    assert out["sf1_plan_metrics"] == prev["sf1_plan_metrics"]
    assert out["sf1_partial_attempt"]["sf1_tail_sec"]["error"] == "boom"
    # complete current run passes through untouched
    complete = {"sf1_tail_sec": {q: 1.0 for q in tail},
                "sf1_plan_metrics": {q: {"input_records": 2} for q in tail}}
    out2 = bench._carry_sf1_evidence(dict(complete), prev, tail)
    assert "sf1_carried_from_previous_run" not in out2
    assert out2["sf1_plan_metrics"] == complete["sf1_plan_metrics"]
    # partial with NO previous evidence: left as-is (the gate then
    # fails loudly, by design)
    out3 = bench._carry_sf1_evidence(
        {"sf1_tail_sec": {}, "sf1_plan_metrics": {"q1": {}}}, {}, tail)
    assert "sf1_carried_from_previous_run" not in out3
