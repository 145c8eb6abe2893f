"""Unit tests for the extension tier (E1 dedup, E2 similarity, E3
text, multimodal/UDF) on crafted inline data — the sf tables contain
no true near-dups, so these tests build clusters where the detectors
must fire, and verify exact expected behavior."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weatherflow_spark.functions import text as T
from weatherflow_spark.plans import QUERIES
from weatherflow_spark.plans.ext_dedup import (
    JACCARD_THRESHOLD,
    q_minhash_near_dup,
    q_simhash_near_dup,
)
from weatherflow_spark.multimodal.binary import multimodal_features
from tests.conftest import SF_SMALL

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm mat near the old oak door"
)
NEAR = BASE.replace("warm", "cold")  # one-token edit → high jaccard
FAR = "completely different words about spark shuffles and parquet row groups here"


def _docs_df(spark):
    rows = [
        (1, BASE, "en", "s0", len(BASE)),
        (2, NEAR, "en", "s0", len(NEAR)),
        (3, FAR, "en", "s0", len(FAR)),
        (4, BASE, "en", "s0", len(BASE)),  # exact dup of 1 (same block)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """Crafted docs written as a parquet 'sf dir' so the registered
    queries can run on them unmodified."""
    d = tmp_path_factory.mktemp("craft")
    _docs_df(spark).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_near_dup_finds_cluster(spark, docs_dir):
    out = q_minhash_near_dup(spark, docs_dir).toPandas()
    pairs = {(r.doc_a, r.doc_b): (r.jaccard, r.is_dup) for r in out.itertuples()}
    assert (1, 4) in pairs and pairs[(1, 4)][0] == 1.0 and pairs[(1, 4)][1] == 1
    assert (1, 2) in pairs and pairs[(1, 2)][1] == 1  # one-token edit ≥ threshold
    assert pairs[(1, 2)][0] > JACCARD_THRESHOLD
    # FAR shares no shingles with BASE — never a verified dup
    assert all(not (a == 3 or b == 3) or jd[1] == 0 for (a, b), jd in pairs.items())


def test_simhash_identical_docs_hamming_zero(spark, docs_dir):
    out = q_simhash_near_dup(spark, docs_dir).toPandas()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out.itertuples()}
    assert pairs.get((1, 4)) == 0  # identical text → identical simhash


def test_dedup_exact_survivor_policy(spark, docs_dir):
    out = QUERIES["q_dedup_exact"](spark, docs_dir).toPandas()
    assert len(out) == 3  # 4 docs, one exact dup pair
    dup_row = out[out.n_copies == 2]
    assert len(dup_row) == 1 and dup_row.iloc[0].keep_doc_id == 1  # lowest id survives


def test_ngram_jaccard_ranks_dup_first(spark, docs_dir):
    out = QUERIES["q_ngram_jaccard"](spark, docs_dir).toPandas()
    # exact dup pair (1,4) must rank first with jaccard 1.0
    assert out.iloc[0].doc_a == 1 and out.iloc[0].doc_b == 4
    assert out.iloc[0].jaccard == 1.0


def test_incremental_dedup_verdicts(spark, tmp_path):
    """Batch-vs-corpus admission: exact copy → exact_dup, one-token
    edit → near_dup (with its Jaccard), unrelated text → new."""
    from weatherflow_spark.plans.ext_dedup import q_incremental_dedup

    unique = "an entirely unrelated sentence mentioning neither foxes nor dogs at all today"
    rows = [
        (0, BASE, "en", "s0", len(BASE)),    # batch: exact copy of corpus doc 1
        (1, BASE, "en", "s0", len(BASE)),    # corpus
        (3, FAR, "en", "s0", len(FAR)),      # corpus
        (5, NEAR, "en", "s0", len(NEAR)),    # batch: near-dup of corpus doc 1
        (10, unique, "en", "s0", len(unique)),  # batch: genuinely new
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r.doc_id: r for r in q_incremental_dedup(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 5, 10}  # one verdict per batch doc
    assert out[0].verdict == "exact_dup"
    assert out[5].verdict == "near_dup"
    assert out[5].best_jaccard > JACCARD_THRESHOLD
    assert out[10].verdict == "new"
    assert out[10].best_jaccard is None  # no corpus candidate at all


def test_decontaminate_flags_verbatim_overlap(spark, tmp_path):
    """A corpus doc sharing an 8-token verbatim run with the
    benchmark source is flagged; paraphrased/unrelated docs are not."""
    from weatherflow_spark.plans.ext_text import (
        DECON_BENCH_SOURCE,
        q_decontaminate,
    )

    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    leaked = "intro words then alpha beta gamma delta epsilon zeta eta theta closing"
    clean = "entirely different tokens with no shared run of any length here at all"
    rows = [
        (1, bench, "en", DECON_BENCH_SOURCE, len(bench)),
        (2, leaked, "en", "web", len(leaked)),   # contains the 8-token run
        (3, clean, "en", "web", len(clean)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r.doc_id: r for r in q_decontaminate(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 3}  # benchmark docs get no verdict row
    assert out[2].contaminated == 1 and out[2].n_shared_grams >= 1
    assert out[3].contaminated == 0 and out[3].n_shared_grams == 0


def test_rolling_hash_matches_python(spark):
    """The cross-engine hash semantics, pinned in plain Python."""
    def py_tok_hash(tok: str) -> int:
        h = 0
        for c in tok:
            h = (h * T.CHAR_P + ord(c)) % T.MOD
        return h

    df = spark.createDataFrame([("key agg row",)], ["text"])
    [row] = df.select(T.token_hashes("text").alias("th")).collect()
    assert row.th == [py_tok_hash(t) for t in "key agg row".split(" ")]


def test_shingle_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",)], ["text"])
    got = df.select(T.shingle_hashes("text").alias("sh")).collect()
    assert got[0].sh == []          # 2 tokens < 3 → no shingles
    assert len(got[1].sh) == 1      # exactly one 3-shingle


def test_multimodal_features_plumbing(spark):
    docs = spark.createDataFrame(
        [(7, "abc", "en", "s", 3), (8, "", "en", "s", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r.doc_id: r for r in multimodal_features(docs).collect()}
    assert out[7].n_bytes == 3
    assert out[7].header_byte == ord("a")
    assert out[7].checksum == (ord("a") + ord("b") + ord("c")) % T.MOD
    assert out[7].mime == "application/octet-stream"
    assert out[8].n_bytes == 0 and out[8].header_byte == 0 and out[8].checksum == 0


def test_multimodal_frame_sampling(spark):
    from weatherflow_spark.multimodal.binary import multimodal_frames

    long_text = "x" * 100  # stride 25 → 4 frames at 0/25/50/75
    docs = spark.createDataFrame(
        [(1, long_text, "en", "s", 100), (2, "ab", "en", "s", 2), (3, "", "en", "s", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = multimodal_frames(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 1 input row → 4 frame rows (the 1→N multiplication)
    assert sorted(r.frame_offset for r in by_doc[1]) == [0, 25, 50, 75]
    assert all(r.frame_len == min(32, 100 - r.frame_offset) for r in by_doc[1])
    # short payload (stride 0) → exactly one frame
    assert len(by_doc[2]) == 1 and by_doc[2][0].frame_len == 2
    # empty payload → one empty frame, hash 0
    assert len(by_doc[3]) == 1 and by_doc[3][0].frame_hash == 0
    # frame hash is the engine char fold
    h = 0
    for b in b"x" * 32:
        h = (h * T.CHAR_P + b) % T.MOD
    assert by_doc[1][0].frame_hash == h


def test_multimodal_resize_plumbing(spark):
    from weatherflow_spark.multimodal.binary import multimodal_resize

    docs = spark.createDataFrame(
        [(1, "a" * 100, "en", "s", 100), (2, "ab", "en", "s", 2)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r.doc_id: r for r in multimodal_resize(docs, target_bytes=16).collect()}
    # every payload lands on the fixed byte plane, binary-in/binary-out
    assert out[1].n_bytes == 16 and out[1].was_truncated == 1
    assert bytes(out[1].payload) == b"a" * 16
    assert out[2].n_bytes == 16 and out[2].was_truncated == 0
    assert bytes(out[2].payload) == b"ab" + b"\x00" * 14


def test_ann_recall_vs_brute_force(spark):
    """IVF with 2 probed cells over 10 must contain the brute-force
    top-1 (the query's own cell is always probed); LSH multi-probe
    top-1 cosine must be ≤ brute-force top-1 (it searches a subset)."""
    brute = QUERIES["q_similarity_topk"](spark, SF_SMALL).toPandas()
    ivf = QUERIES["q_ann_ivf_topk"](spark, SF_SMALL).toPandas()
    lsh = QUERIES["q_ann_lsh_topk"](spark, SF_SMALL).toPandas()
    assert brute.iloc[0].cosine >= ivf.iloc[0].cosine
    assert brute.iloc[0].cosine >= lsh.iloc[0].cosine
    assert set(ivf.vec_id).issubset(set(range(10_000)))
    assert len(ivf) == 10 and len(brute) == 10


def test_lang_id_stopword_scoring(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog in the house", "en", "s", 10),
         (2, "el perro y la casa es un gato en madrid", "es", "s", 10)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    scores = df.select(
        "doc_id",
        F.expr(T._stop_hits_expr("text", T.LANG_STOPWORDS["en"])).alias("en"),
        F.expr(T._stop_hits_expr("text", T.LANG_STOPWORDS["es"])).alias("es"),
    ).collect()
    byid = {r.doc_id: r for r in scores}
    assert byid[1].en > byid[1].es
    assert byid[2].es > byid[2].en


def test_hll_distinct_properties(spark):
    """The deterministic HLL's raw estimate must land within the
    standard-error envelope (1.04/sqrt(256) ~ 6.5%; allow 4 sigma)
    and the register accounting must be internally consistent."""
    row = QUERIES["q_hll_distinct"](spark, SF_SMALL).collect()[0]
    assert row.exact_distinct > 0
    assert row.rel_err <= 4 * 1.04 / (256 ** 0.5)
    assert 0 <= row.n_zero_registers < 256
    assert row.hll_estimate > 0


def test_repetition_filter_flags_degenerate_docs(spark):
    """A maximally repetitive doc must be dropped; a fully distinct
    doc must be kept — and the metrics must hit their closed forms."""
    from weatherflow_spark.plans.ext_text import q_repetition_filter

    distinct_text = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam", "en", "s", 10),
         (2, distinct_text, "en", "s", 10),
         (3, "solo", "en", "s", 4)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.mode("overwrite").parquet("/tmp/repfilter_docs/documents.parquet")
    out = {r.doc_id: r for r in q_repetition_filter(
        spark, "/tmp/repfilter_docs").collect()}
    assert out[1].top_2gram_frac == 1.0 and not out[1].keep
    # 40 distinct tokens -> every 2-gram unique (1/39 < 0.05), ttr = 1
    assert out[2].top_2gram_frac < 0.05 and out[2].keep
    # single-token doc: no 2-grams -> fraction pinned to 0, ttr = 1
    assert out[3].top_2gram_frac == 0.0 and out[3].ttr == 1.0


def test_hll_registers_merge_by_max(spark):
    """The 100 TB contract: sketching two disjoint halves and merging
    register tables by bucket-wise max must equal sketching the whole
    dataset — the property that lets each executor/partition/day
    sketch independently."""
    from weatherflow_spark.io import load_table
    from weatherflow_spark.plans.sketches import hll_registers

    orders = load_table(spark, SF_SMALL, "orders")
    whole = {r.b: r.m for r in hll_registers(orders, "o_custkey").collect()}
    h1 = hll_registers(orders.where(F.col("o_orderkey") % 2 == 0), "o_custkey")
    h2 = hll_registers(orders.where(F.col("o_orderkey") % 2 == 1), "o_custkey")
    merged = {}
    for r in h1.collect() + h2.collect():
        merged[r.b] = max(merged.get(r.b, 0), r.m)
    assert merged == whole


def test_sketch_serve_reads_a_multi_slice_cube(spark):
    """E82's serve must really come from a PERSISTED multi-slice cube
    (build + late append): the scratch table must hold one partition
    per slice after the query runs — a silent collapse to a single
    unsliced write would still hash-match, so the parity check alone
    can't pin the cube shape."""
    import os

    from weatherflow_spark.plans.serving import (
        SKETCH_SLICES,
        _scratch_dir,
        q_sketch_serve,
    )

    out = {r.event_type: r for r in q_sketch_serve(spark, SF_SMALL).collect()}
    assert out, "expected per-group estimates"
    base = os.path.join(_scratch_dir(SF_SMALL), "sketch_cube")
    slices = sorted(
        d for d in os.listdir(base) if d.startswith("slice_id=")
    )
    assert slices == [f"slice_id={i}" for i in range(SKETCH_SLICES)]
    for r in out.values():
        assert r.hll_estimate > 0
        assert abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct < 0.25


def test_fuzzy_join_finds_same_noun_variants(spark):
    """Every reported pair shares its final (noun) token and is
    within the edit-distance budget; the closest pairs come first."""
    out = QUERIES["q_fuzzy_join"](spark, SF_SMALL).collect()
    assert out, "expected at least one fuzzy pair"
    for r in out:
        assert r.name_a.split()[-1] == r.name_b.split()[-1]
        assert 1 <= r.lev <= 4
    assert [r.lev for r in out] == sorted(r.lev for r in out)


# ---------------------------------------------------------------------------
# PII redaction + context-window chunking (curation-suite branches)
# ---------------------------------------------------------------------------


def _fp_of(spark, text: str) -> int:
    """Cross-checked rolling fingerprint of a literal string, via the
    same Spark expression the engine uses."""
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(F.expr(T.doc_fingerprint_expr("t")).alias("fp")).collect()[0].fp


def test_pii_redact_counts_and_replaces(spark, tmp_path):
    from weatherflow_spark.plans.ext_text import q_pii_redact

    dirty = "reach me at bob@test.org or 192.168.0.1 or 555-123-4567 thanks"
    clean = "just regular words with no personal information at all"
    rows = [
        # doc_id % 5 == 3 → no deterministic injection; only the
        # text's own PII counts.
        (3, dirty, "en", "s0", len(dirty)),
        (8, clean, "en", "s0", len(clean)),
        # doc_id % 5 == 0 → the weaving appends an email.
        (5, clean, "en", "s0", len(clean)),
    ]
    d = tmp_path / "pii"
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r.doc_id: r for r in q_pii_redact(spark, str(d)).collect()}
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones, out[3].clean) == (
        1, 1, 1, 0,
    )
    assert (out[8].n_emails, out[8].n_ips, out[8].n_phones, out[8].clean) == (
        0, 0, 0, 1,
    )
    assert out[5].n_emails == 1 and out[5].clean == 0  # woven email found

    # the fingerprint certifies the exact replacement bytes
    want_redacted = "reach me at [EMAIL] or [IP] or [PHONE] thanks"
    assert out[3].redacted_fp == _fp_of(spark, want_redacted)
    assert out[8].redacted_fp == _fp_of(spark, clean)  # untouched text


def test_doc_chunks_boundaries_and_content(spark, tmp_path):
    from weatherflow_spark.plans.ext_text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q_doc_chunks,
    )

    toks70 = [f"w{i}" for i in range(70)]
    toks10 = [f"t{i}" for i in range(10)]
    rows = [
        (1, " ".join(toks70), "en", "s0", 70),
        (2, " ".join(toks10), "en", "s0", 10),
    ]
    d = tmp_path / "chunks"
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = q_doc_chunks(spark, str(d)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c70 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # 70 tokens, C=32, stride 24 → starts 0/24/48, lens 32/32/22
    assert [(r.chunk_start, r.chunk_len) for r in c70] == [(0, 32), (24, 32), (48, 22)]
    # a short doc yields exactly one whole-doc chunk
    assert [(r.chunk_start, r.chunk_len) for r in by_doc[2]] == [(0, 10)]
    # chunk fingerprint == document fingerprint of the chunk's tokens
    assert c70[2].chunk_fp == _fp_of(spark, " ".join(toks70[48:70]))
    assert by_doc[2][0].chunk_fp == _fp_of(spark, " ".join(toks10))
    # consecutive chunks overlap by C - stride tokens
    assert CHUNK_TOKENS - CHUNK_STRIDE == 8
    assert c70[1].chunk_start == c70[0].chunk_start + CHUNK_STRIDE


def test_sequence_pack_offsets_and_boundaries(spark, tmp_path):
    from weatherflow_spark.plans.ext_text import PACK_TOKENS, q_sequence_pack

    assert PACK_TOKENS == 512
    # three docs in one stream with known BPE-token counts: the word
    # "aa" is one token under the BPE-ish regex, so token count ==
    # word count for these texts.
    def words(n):
        return " ".join(["aa"] * n)

    rows = [
        (1, words(300), "en", "s0", 300),
        (2, words(300), "en", "s0", 300),
        (3, words(100), "en", "s0", 100),
        (9, words(50), "en", "s1", 50),  # separate stream packs from 0
    ]
    d = tmp_path / "pack"
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r.doc_id: r for r in q_sequence_pack(spark, str(d)).collect()}
    assert (out[1].pack_id, out[1].pack_offset, out[1].crosses_boundary) == (0, 0, 0)
    # doc 2 spans tokens 300..599 → starts in pack 0, crosses into 1
    assert (out[2].pack_id, out[2].pack_offset, out[2].crosses_boundary) == (0, 300, 1)
    # doc 3 spans 600..699 → wholly inside pack 1
    assert (out[3].pack_id, out[3].pack_offset, out[3].crosses_boundary) == (1, 88, 0)
    # a different source is an independent packing stream
    assert (out[9].pack_id, out[9].pack_offset) == (0, 0)


def test_ann_batch_per_query_ranking(spark):
    """Batched ANN: every query gets exactly BATCH_TOP_K ranked
    candidates, ranks are dense 1..k per query, cosines descend with
    rank, and a query never matches itself."""
    from weatherflow_spark.plans.ext_similarity import (
        BATCH_QUERY_IDS,
        BATCH_TOP_K,
        q_ann_batch_topk,
    )

    rows = q_ann_batch_topk(spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        assert r.vec_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(BATCH_QUERY_IDS)
    for q_id, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, BATCH_TOP_K + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_multimodal_decoder_branch_dispatch(spark):
    """E11 decode seam: whichever decode branch is importable here
    (Pillow-backed real decode, or the stub in this codec-less
    sandbox) must run through the SAME mapInPandas plumbing with the
    same Arrow batch shape. With Pillow present, a real 2x2 PNG
    decodes to a 12-byte RGB plane; without it, the stub passes the
    payload through — either way the schema, row count, and feature
    arithmetic hold."""
    from weatherflow_spark.multimodal.binary import (
        FEATURE_SCHEMA,
        decode_image_pillow,
        decode_image_stub,
        default_decoder,
        make_extract_features,
        with_binary_payload,
    )

    decode = default_decoder()
    try:
        import PIL  # noqa: F401

        assert decode is decode_image_pillow
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (2, 2), (1, 2, 3)).save(buf, format="PNG")
        payload_text = None  # real branch: craft the PNG below
        png = buf.getvalue()
        expected_n_bytes = 12  # 2*2 pixels * 3 channels
    except ImportError:
        assert decode is decode_image_stub
        payload_text = "abc"
        png = None
        expected_n_bytes = 3

    if png is not None:
        import pandas as pd

        # Drive the worker directly with the PNG payload (the Spark
        # path below exercises the stub's text payload).
        worker = make_extract_features(decode)
        out = list(
            worker(
                iter(
                    [
                        pd.DataFrame(
                            {
                                "doc_id": [1],
                                "payload": [png],
                                "meta": [{"n_bytes": len(png), "mime": "image/png"}],
                            }
                        )
                    ]
                )
            )
        )
        assert len(out) == 1 and out[0]["n_bytes"].iloc[0] == expected_n_bytes
    else:
        docs = spark.createDataFrame(
            [(1, payload_text, "en", "s", len(payload_text))],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = (
            with_binary_payload(docs)
            .mapInPandas(make_extract_features(decode), FEATURE_SCHEMA)
            .collect()
        )
        assert len(rows) == 1 and rows[0].n_bytes == expected_n_bytes


def test_bpe_merge_fold_is_leftmost_nonoverlapping(spark):
    """The BPE merge fold must implement scan-resumes-after-the-merge:
    a run of three identical symbols merges only its first pair, and
    for a != b every disjoint occurrence merges in one round."""
    from weatherflow_spark.plans.ext_mining import _merge_fold_spark

    df = spark.createDataFrame(
        [
            (1, ["a", "a", "a"]),
            (2, ["a", "b", "a", "b", "b"]),
            (3, ["x"]),
            (4, ["b", "a"]),
        ],
        "id: int, syms: array<string>",
    )
    # pair (a, a): run of three -> [aa, a]
    got = {
        r.id: r.m
        for r in df.select(
            "id",
            F.expr(_merge_fold_spark("'a'", "'a'")).alias("m"),
        ).collect()
    }
    assert got[1] == ["aa", "a"]
    assert got[2] == ["a", "b", "a", "b", "b"]
    # pair (a, b): both disjoint occurrences merge, order preserved
    got = {
        r.id: r.m
        for r in df.select(
            "id",
            F.expr(_merge_fold_spark("'a'", "'b'")).alias("m"),
        ).collect()
    }
    assert got[2] == ["ab", "ab", "b"]
    assert got[3] == ["x"]
    assert got[4] == ["b", "a"]


def test_bpe_train_learns_frequency_ordered_merges(spark):
    """Merge rounds must be learned greedily: each round's pair count
    is the max over the current symbol state, so counts are
    non-increasing only within what the previous merges allow — at
    minimum, every learned rule must have a positive count and rules
    must be distinct."""
    out = QUERIES["q_bpe_train"](spark, SF_SMALL).collect()
    assert len(out) == 4
    rules = {(r.left_sym, r.right_sym) for r in out}
    assert len(rules) == 4
    assert all(r.pair_count > 0 for r in out)
    rounds = sorted(r.merge_round for r in out)
    assert rounds == [1, 2, 3, 4]


def test_event_sequences_guards_short_histories(spark, tmp_path):
    """ADVICE r7: a user with < SEQ_N events must yield no trigrams,
    not an element_at crash (Spark's sequence(3, 2) DESCENDS instead
    of returning empty like DuckDB's generate_series)."""
    import datetime as dt

    from weatherflow_spark.plans.analytics import q_event_sequences

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: only 2 events — previously crashed trigram expansion
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0, 1, "click", 1.0, "{}"),
        # user 2: 3 events — exactly one trigram
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0, 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = q_event_sequences(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].path == "view>click>purchase"
    assert out[0].n_occurrences == 1 and out[0].n_users == 1


def test_bigram_lm_guards_one_token_docs(spark, tmp_path):
    """ADVICE r7: a 1-token document (including empty text, since
    split('', ' ') = ['']) must contribute no bigrams and score 0 —
    not crash the model phase's pair expansion."""
    from weatherflow_spark.plans.ext_text import q_bigram_lm_score

    rows = [
        (1, "", "en", "s0", 0),                  # -> [''] after split
        (2, "solo", "en", "s0", 4),              # 1 token
        (3, "the cat sat", "en", "s0", 11),      # normal doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r.doc_id: r for r in q_bigram_lm_score(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].bi_nll_e6 == 0 and out[2].bi_nll_e6 == 0  # < 2 tokens => 0
    assert out[3].bi_nll_e6 > 0


def test_containment_sweep_catches_quote_the_minhash_gate_misses(spark, tmp_path):
    """E60 recall gap (verdict r7 #8): a 20-token quote embedded
    verbatim in a ~2,000-token page has Jaccard ~0.01 — the banded
    MinHash gate misses the pair with near certainty, while its
    containment is ~1.0. The inverted-index sweep must catch it."""
    from weatherflow_spark.plans.ext_dedup import (
        q_containment,
        q_containment_sweep,
    )

    quote_words = [f"qq{i}" for i in range(20)]  # 20 unique tokens
    quote = " ".join(quote_words)
    page_words = [f"pw{i % 997}x{i % 31}" for i in range(1980)]
    page = " ".join(page_words[:990] + quote_words + page_words[990:])
    filler = [
        (10 + i, " ".join(f"f{i}w{j}" for j in range(40)), "en", "web", 200)
        for i in range(6)
    ]
    rows = [
        (1, quote, "en", "quotes", len(quote)),
        (2, page, "en", "web", len(page)),
        *filler,
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    gate_pairs = {
        (r.doc_a, r.doc_b) for r in q_containment(spark, str(tmp_path)).collect()
    }
    assert (1, 2) not in gate_pairs, (
        "fixture regression: the MinHash gate caught the extreme-ratio "
        "pair this sweep exists for — rebuild the fixture"
    )
    sweep = {
        (r.doc_a, r.doc_b): r
        for r in q_containment_sweep(spark, str(tmp_path)).collect()
    }
    assert (1, 2) in sweep
    hit = sweep[(1, 2)]
    # all 17 of the quote's 4-gram shingles appear in the page
    assert hit.n_min == 17 and hit.n_inter == 17
    assert hit.containment_e6 == 1_000_000


def test_incremental_embedding_verdicts(spark, tmp_path):
    """E79 batch-vs-corpus embedding admission: an exact copy of a
    corpus vector -> dup (cos 1.0); an orthogonal vector -> new."""
    from weatherflow_spark.operators.caching import release_caches
    from weatherflow_spark.plans.ext_similarity import (
        INCR_EMB_MOD,
        q_incremental_embedding,
    )

    d = 8
    base = [1.0] + [0.0] * (d - 1)
    ortho = [0.0, 1.0] + [0.0] * (d - 2)
    near = [0.98, 0.199] + [0.0] * (d - 2)  # cos ~0.98 vs base
    rows = [
        (0, base, 0),                 # batch (0 % 13 == 0): exact copy
        (INCR_EMB_MOD, ortho, 0),     # batch: orthogonal to everything
        (2 * INCR_EMB_MOD, near, 0),  # batch: near-dup of base
        (1, base, 0),                 # corpus original
        (2, [0.5] * d, 0),            # corpus filler
        (3, [-1.0] + [0.2] * (d - 1), 0),
    ]
    import pyspark.sql.types as PT

    schema = PT.StructType([
        PT.StructField("vec_id", PT.LongType()),
        PT.StructField("embedding", PT.ArrayType(PT.FloatType())),
        PT.StructField("label", PT.IntegerType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))
    try:
        out = {
            r.vec_id: r for r in q_incremental_embedding(spark, str(tmp_path)).collect()
        }
        assert set(out) == {0, INCR_EMB_MOD, 2 * INCR_EMB_MOD}
        assert out[0].verdict == "dup" and out[0].best_cos_e6 == 1_000_000
        assert out[0].best_match == 1
        assert out[2 * INCR_EMB_MOD].verdict == "dup"
        assert out[2 * INCR_EMB_MOD].best_cos_e6 >= 950_000
        assert out[INCR_EMB_MOD].verdict == "new"
    finally:
        release_caches()
        spark.catalog.clearCache()


def test_signature_index_grows_with_admitted_docs(spark, tmp_path):
    """E81: build index from corpus, admit batch 1 (a new doc),
    append its signatures, then batch 2 containing a near-copy of the
    batch-1 doc must be flagged against the GROWN index — text never
    re-read."""
    from weatherflow_spark.operators.sig_index import (
        admit_with_index,
        append_signature_index,
        build_signature_index,
    )

    corpus_text = "the quick brown fox jumps over the lazy dog every single day"
    novel = "completely fresh sentence about distributed systems and parquet files"
    novel_near = "completely fresh sentence about distributed systems and parquet files today"
    rows = lambda *items: spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in items],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    path = str(tmp_path / "idx")
    build_signature_index(rows((1, corpus_text)), path)

    b1 = rows((10, novel))
    v1 = {r.doc_id: r.verdict for r in admit_with_index(spark, b1, path).collect()}
    assert v1 == {10: "new"}
    append_signature_index(b1, path)

    b2 = rows((20, novel_near), (21, corpus_text))
    v2 = {r.doc_id: r.verdict for r in admit_with_index(spark, b2, path).collect()}
    assert v2[21] == "exact_dup"          # vs original corpus
    assert v2[20] == "near_dup"           # vs the batch-1 doc, via the APPEND


def test_phash_catches_near_identical_planes_exact_hash_misses(spark, tmp_path):
    """E86 (r9): byte-level near-identical planes that the EXACT
    content hash misses must pair under the perceptual hash. Doc 2 is
    doc 1 with four bytes flipped (different sha, same block-average
    profile → Hamming ~0); doc 3 is the inverted plane (every block
    mean on the other side of the global mean → Hamming ~60, no
    shared band, never a candidate)."""
    from weatherflow_spark.plans.ext_dedup import (
        PHASH_HAMMING_MAX,
        q_phash_near_dup,
    )

    base = "".join(("a" if i % 2 == 0 else "z") * 20 for i in range(60))
    mutated = list(base)
    for p in (30, 310, 770, 1150):  # flip bytes inside 'z' blocks: z -> y
        mutated[p] = "y" if mutated[p] == "z" else "b"
    mutated = "".join(mutated)
    inverted = "".join(("z" if i % 2 == 0 else "a") * 20 for i in range(60))
    assert mutated != base  # the exact hash misses exactly this pair

    df = spark.createDataFrame(
        [
            (1, base, "en", "s0", len(base)),
            (2, mutated, "en", "s0", len(mutated)),
            (3, inverted, "en", "s0", len(inverted)),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "phash_sf"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {(r.doc_a, r.doc_b): r.hamming for r in q_phash_near_dup(spark, str(d)).collect()}
    assert (1, 2) in out and out[(1, 2)] <= PHASH_HAMMING_MAX
    assert out[(1, 2)] <= 4  # a few flipped bytes, not a different plane
    assert (1, 3) not in out and (2, 3) not in out


def test_media_segments_gaps_and_islands(spark, tmp_path):
    """E87 (r9): known plane → known segments. Two consecutive
    high-energy frames, a silent frame, one more active frame, then
    silence: exactly two segments, [0,32) with 2 windows and [48,64)
    with 1 — the gaps-and-islands contract over the VAD flags."""
    from weatherflow_spark.plans.ext_udf import q_media_segments

    text = "z" * 32 + " " * 16 + "z" * 16 + " " * 16
    df = spark.createDataFrame(
        [(1, text, "en", "s0", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tmp_path / "seg_sf"
    d.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    segs = {
        (r.seg_start, r.seg_end): (r.n_windows, r.energy)
        for r in q_media_segments(spark, str(d)).collect()
    }
    z_e = 16 * 122 * 122  # one all-'z' window's energy
    assert segs == {(0, 32): (2, 2 * z_e), (48, 64): (1, z_e)}


def test_span_dedup_exact_boundaries_and_cross_doc_only(spark):
    """E89 (r9): the repeated-span profile must (a) find the shared
    run with EXACT token boundaries, (b) merge overlapping duplicated
    windows into one maximal span, and (c) ignore repetition that
    lives inside a single document (that is E25's contract)."""
    from weatherflow_spark.plans.ext_dedup import repeated_span_profile

    shared = [f"sh{i}" for i in range(12)]  # 12-token run in docs 1+2
    a_words = [f"aa{i}" for i in range(30)] + shared + [
        f"ab{i}" for i in range(25)
    ]
    b_words = [f"ba{i}" for i in range(10)] + shared + [
        f"bb{i}" for i in range(40)
    ]
    # doc 3: an 8-gram repeated TWICE within itself but nowhere else —
    # must produce no span (cross-doc only).
    rep = [f"rr{i}" for i in range(8)]
    c_words = rep + [f"ca{i}" for i in range(20)] + rep + [
        f"cb{i}" for i in range(20)
    ]
    rows = [
        (1, " ".join(a_words), "en", "web", 0),
        (2, " ".join(b_words), "en", "web", 0),
        (3, " ".join(c_words), "en", "web", 0),
        (4, " ".join(f"dd{i}" for i in range(40)), "en", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = {r.doc_id: r for r in repeated_span_profile(docs, n=8).collect()}
    # the 12-token run yields windows at 5 consecutive start positions
    # per doc — they must merge into ONE span of exactly 12 tokens
    assert set(out) == {1, 2}, f"cross-doc-only violated: {sorted(out)}"
    for doc_id, start in ((1, 30), (2, 10)):
        r = out[doc_id]
        assert r.n_spans == 1 and r.dup_tokens == 12, r
    assert out[1].n_tokens == 67 and out[2].n_tokens == 62
    assert out[1].dup_ratio_e6 == 12 * 1_000_000 // 67
