"""Driver-contract parity: every oracle-backed ``__spark_entry__`` query
must match its DuckDB oracle at sf0.001 (row count, sorted-column schema,
order-insensitive value hash) — the same comparison the driver gate runs
at sf0.01 (tools/check_oracle.py is the full-size replica)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import normalize, value_hash

from bloomfilter_spark.sources.tables import TABLES

# cheap-at-sf0.001 oracle-backed queries; the heavier sketch builds
# (q04/q12/q24) have their guarantees covered in test_spark_agg.py
CHECKED = [
    "q01_pricing_summary", "q02_dedup_exact", "q03_bloom_semijoin_agg",
    "q05_heavy_hitters", "q06_topk_per_group", "q07_token_stats",
    "q08_quality_by_source", "q09_sessionization", "q10_fingerprint_dedup",
    "q11_ann_cosine_topk", "q13_bloom_antijoin_agg", "q14_shipping_priority",
    "q15_asof_join", "q16_rollup_pricing", "q17_revenue_by_nation",
    "q18_set_ops", "q19_price_band_range_join", "q30_embedding_neardup_exact",
    "q31_streaming_window_counts",
    # bound-assertion sketch queries (exact column + within-bound flag)
    "q20_hll_distinct_users", "q21_cms_type_counts", "q22_kll_value_quantiles",
    "q23_tdigest_price_quantiles", "q25_minhash_neardup", "q26_simhash_neardup",
    "q27_lang_id", "q28_multimodal_features", "q29_sketch_cube",
    "q32_grouped_kll_quantiles", "q33_streaming_stateful_hll",
    "q34_ngram_jaccard", "q35_embedding_neardup_lsh", "q36_ann_lsh_recall",
    "q60_sequence_packing", "q61_zorder_pruning",
    # transcripts flagship (north-rule shape; fixed-size deterministic
    # corpus shared by query + oracle, so sf_dir-independent)
    "q80_token_vocabulary", "q81_transcripts_text_parity",
    "q82_transcripts_conv_turns", "q83_transcripts_tool_hitters",
    "q84_transcripts_latency_quantiles", "q85_transcripts_dedup",
    "q86_tfidf_keywords", "q87_unigram_logprob", "q88_char_entropy",
    "q89_mg_heavy_hitters", "q90_salted_skew_join",
    "q91_transcripts_tool_transitions", "q92_transcripts_tool_latency",
    "q93_extreme_quantiles", "q94_grouped_extreme_quantiles",
    "q95_rolling_distinct_window", "q96_freq_bracket",
    "q97_retention_by_segment", "q98_streaming_mg_hitters",
]


def test_every_query_has_an_oracle():
    """Round-2 bar: zero rows-only queries — every operator the contract
    claims is oracle-checked by the driver."""
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_contract_complete():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    for name in CHECKED:
        assert name in qs and name in oracles


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spdf = normalize(entry_mod.queries()[name](spark, sf_dir).toPandas())
    opdf = normalize(duck.execute(entry_mod.oracle_sql()[name]).df())
    assert len(spdf) == len(opdf)
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert value_hash(spdf) == value_hash(opdf)


def test_driver_window_rotation_round5():
    """Pins the round-5 driver correctness window (see the rotation-policy
    comment in queries(), COVERAGE.md's ledger, and ROUND5_NOTES.md §1):
    the FIRST 50 dict entries must be exactly the new q100 canary + the
    49 queries last driver-witnessed in r3 (q01-q19, q20-q45, q55-q59) —
    an accidental reorder would silently un-witness components."""
    names = list(entry_mod.queries())
    assert len(names) == len(set(names)) == 100
    window = names[:50]
    assert window[0] == "q100_scalable_bloom_dedup"
    nums = sorted(int(n[1:3]) for n in window[1:])
    assert nums == sorted((set(range(1, 46)) - {4}) | set(range(55, 60)))
    # every r4-witnessed query stays registered below the window
    r4 = {4} | set(range(46, 55)) | set(range(60, 100))
    assert sorted(int(n[1:3]) for n in names[50:]) == sorted(r4)


def test_stream_source_dir_self_heals(tmp_path):
    """The streaming source helper keys by hash of the ABSOLUTE target
    path (same-basename sf_dirs cannot collide) and re-points dangling or
    stale symlinks instead of silently reusing them / raising
    FileExistsError."""
    import os

    a = tmp_path / "corpusA" / "sf0.01"
    b = tmp_path / "corpusB" / "sf0.01"   # same basename, different dir
    for d in (a, b):
        os.makedirs(d)
        (d / "events.parquet").write_bytes(b"x")

    da = entry_mod._stream_source_dir(str(a))
    db = entry_mod._stream_source_dir(str(b))
    assert da != db                        # no basename collision
    la = os.path.join(da, "events.parquet")
    assert os.readlink(la) == str(a / "events.parquet")

    # dangling link: target removed -> helper must re-point, not raise
    os.remove(a / "events.parquet")
    (a / "events.parquet").write_bytes(b"y")
    assert entry_mod._stream_source_dir(str(a)) == da
    assert os.readlink(la) == str(a / "events.parquet")

    # stale link (points elsewhere): re-pointed to the right target
    os.remove(la)
    os.symlink(str(b / "events.parquet"), la)
    entry_mod._stream_source_dir(str(a))
    assert os.readlink(la) == str(a / "events.parquet")

    # a regular file squatting on the link path is replaced
    os.remove(la)
    with open(la, "wb") as fh:
        fh.write(b"junk")
    entry_mod._stream_source_dir(str(a))
    assert os.path.islink(la)


def test_every_query_has_docstring_and_catalog_current():
    """Every queries() entry carries a docstring (the generated
    docs/QUERY_CATALOG.md renders its first line), and the committed
    catalog matches the live registry's size and order-sensitive first
    entries — regenerate with tools/gen_query_catalog.py after adding
    or reordering queries."""
    import os
    import re

    qs = entry_mod.queries()
    undocumented = [k for k, fn in qs.items() if not (fn.__doc__ or "").strip()]
    assert undocumented == []
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "QUERY_CATALOG.md")
    rows = re.findall(r"^\| (\d+) \| `([^`]+)` \|",
                      open(path).read(), flags=re.M)
    assert len(rows) == len(qs)
    assert [name for _, name in rows] == list(qs)


def test_scale_derived_query_params():
    """Pins the scale-parameter derivations the 10x-scale oracle sweep
    forced (docs/ROUND5_CLOSEOUT.md): q37's IVF geometry follows
    n_lists ~ sqrt(n) (pow-2, floor 16; probes = half) so it resolves to
    the measured-green 16/8 at sf0.001/sf0.01 and 32/16 at sf0.1 — a
    regression to a hardcoded 16 would pass the sf0.01 driver gate while
    silently dropping recall@10 to 0.60 at sf0.1."""
    import math

    def n_lists(n):
        return max(16, 1 << round(math.log2(max(1.0, math.sqrt(n)))))

    assert n_lists(47) == 16      # sf0.001 corpus (50 - 3 query rows)
    assert n_lists(497) == 16     # sf0.01
    assert n_lists(1997) == 32    # sf0.1
    assert n_lists(200_000) == 512
    assert n_lists(0) == 16       # degenerate corpus still valid

    # the q37 source uses exactly this formula (keep them in lockstep)
    import inspect
    src = inspect.getsource(entry_mod._q_ann_ivf_recall)
    assert "max(16, 1 << round(math.log2(max(1.0, math.sqrt(n)))))" in src
    assert "n_probes=n_lists // 2" in src

    # q98 sizes MG k from the input's own cardinality (exact-mode
    # contract at any sf), not a constant that happens to hold at sf0.01
    src98 = inspect.getsource(entry_mod._q_streaming_mg_hitters)
    assert "countDistinct" in src98 and "k=int(max_d) + 64" in src98
