"""Semantic pins for the CCNet-stage operators (queries/ccnet_ops.py).

Oracle parity (tests/test_oracle_parity*.py) proves Spark == DuckDB;
these tests pin that both mean the RIGHT thing: planted boilerplate is
removed everywhere, within-conv repeats survive, the allocator
apportions the whole budget, chunk windows tile the document.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.queries import QUERIES
from ocr_spark.queries.ccnet_ops import line_dedup_core
from tests.conftest import SF_DIR_ORACLE


def test_line_dedup_core_semantics(spark):
    turns = spark.createDataFrame(
        [
            ("convA", "unique A1\nBOILERPLATE\nunique A2"),
            ("convB", "BOILERPLATE\nunique B1"),
            ("convC", "repeat\nrepeat\nunique C1"),
        ],
        ["conv_id", "text"],
    )
    got = {r["conv_id"]: r for r in line_dedup_core(turns).collect()}
    # cross-conv duplicate removed from EVERY conversation
    assert got["convA"]["clean_text"] == "unique A1\nunique A2"
    assert (got["convA"]["n_kept"], got["convA"]["n_dropped"]) == (2, 1)
    assert got["convB"]["clean_text"] == "unique B1"
    # within-conversation repeat is NOT boilerplate
    assert got["convC"]["clean_text"] == "repeat\nrepeat\nunique C1"
    assert got["convC"]["n_dropped"] == 0


def test_sample_alloc_apportions_exactly_the_budget(spark):
    rows = QUERIES["sample_alloc"](spark, SF_DIR_ORACLE).collect()
    assert sum(r["alloc"] for r in rows) == 97
    # proportionality sanity: allocation never off by more than 1 from
    # the real-valued quota (the largest-remainder guarantee)
    n = sum(r["n_docs"] for r in rows)
    for r in rows:
        quota = 97 * r["n_docs"] / n
        assert abs(r["alloc"] - quota) < 1.0


def test_doc_chunk_windows_tile_the_document(spark):
    chunks = QUERIES["doc_chunk_windows"](spark, SF_DIR_ORACLE)
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    # stitch: words 1..48 of each chunk + full tail of the last chunk
    # reconstruct the doc exactly
    stitched = (
        chunks.withColumn(
            "n_chunks", F.max("chunk_idx").over(Window.partitionBy("doc_id"))
        )
        .withColumn(
            "piece",
            F.when(
                F.col("chunk_idx") < F.col("n_chunks"),
                F.array_join(F.slice(F.split("chunk_text", " "), 1, 48), " "),
            ).otherwise(F.col("chunk_text")),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "piece"))),
                    lambda x: x.piece,
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    joined = stitched.join(docs.select("doc_id", "text"), "doc_id")
    assert joined.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_ccnet_buckets_are_terciles(spark):
    rows = QUERIES["ccnet_head_middle_tail"](spark, SF_DIR_ORACLE).collect()
    n = len(rows)
    by = {"head": 0, "middle": 0, "tail": 0}
    for r in rows:
        by[r["bucket"]] += 1
    # each bucket holds a third of the corpus (+-1 for rank ties at the
    # interpolated cutpoints)
    for b, c in by.items():
        assert abs(c - n / 3) <= 2, (b, c, n)
    # ordering: every head score exceeds every tail score
    head_min = min(r["mean_p_nano"] for r in rows if r["bucket"] == "head")
    tail_max = max(r["mean_p_nano"] for r in rows if r["bucket"] == "tail")
    assert head_min > tail_max


def test_exact_substr_excise_keeps_one_copy(spark):
    """Planted duplicated span: the lowest doc_id keeps it, every other
    doc loses exactly the covered words; unique text is untouched."""
    from ocr_spark.queries.ngram_ops import exact_substr_core

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix two alpha beta gamma delta suffix two"),
            (3, "totally different words here with nothing shared"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in exact_substr_core(docs).collect()}
    # doc 1 is the lowest holder of "alpha beta gamma delta" -> intact
    assert got[1]["clean_text"] == "alpha beta gamma delta unique one tail"
    assert got[1]["n_excised"] == 0
    # doc 2 loses the 4-word duplicated span, keeps its unique frame
    assert got[2]["clean_text"] == "prefix two suffix two"
    assert got[2]["n_excised"] == 4
    # doc 3 shares nothing
    assert got[3]["n_excised"] == 0


def test_bpe_train_matches_naive_trainer(spark):
    """The distributed trainer's merges == a from-scratch greedy BPE
    (independent implementation: dict-of-tuples, no SQL) on a planted
    corpus, including the count-tie name tie-break."""
    from ocr_spark.queries.bpe_ops import BPE_ITERS, bpe_core

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low new low",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 ["doc_id", "text"])
    got = [(r["sym1"], r["sym2"], r["pair_count"])
           for r in bpe_core(spark, docs).collect()]

    # naive reference trainer
    from collections import Counter
    vocab = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: tuple(w) for w in vocab}
    expect = []
    for _ in range(BPE_ITERS):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += vocab[w]
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    assert got == expect
