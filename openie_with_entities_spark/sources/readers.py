"""Alternate extraction-format scans — the CaRB harness's reader family.

The reference evaluator compares against seven other OIE systems' native
output formats (/root/reference/carb/oie_readers/):

  * OLLIE      ollieReader.py:7-22
  * OpenIE-4   openieFourReader.py:14-59
  * OpenIE-5   openieFiveReader.py:10-38
  * PropS      propsReader.py:10-44
  * ReVerb     reVerbReader.py:8-29
  * Stanford   stanfordReader.py:7-22
  * tabbed     tabReader.py:14-56

plus the two gold-side tabbed variants:

  * ClausIE        clausieReader.py:18-42 (stateful sentence-line format)
  * BenchmarkGold  benchmarkGoldReader.py:17-45

Each reader here is a native-column Spark scan producing the engine's
uniform prediction schema

    (sentence, arg1, rel, arg2, extra_args:array<string>, confidence)

so any of them feeds evaluate.carb_pr / tuple matchers directly (fold()
already consumes extra_args). No Python UDFs: tab splitting, the
OpenIE-4/5 ``s[s.index('(')+1:s.index(',List(')]`` field decode, and the
PropS every-other-column arg walk are all expressed with split / instr /
substr / higher-order functions, so the scans stay inside whole-stage
codegen and scale to arbitrarily large prediction corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.render import py_float_str

_PRED_COLS = ["sentence", "arg1", "rel", "arg2", "extra_args", "confidence"]


def _parts(raw: DataFrame) -> DataFrame:
    return raw.where(F.length(F.trim("value")) > 0).select(
        F.split("value", "\t").alias("p")
    )


def _paren_payload(col: Column) -> Column:
    """``s[s.index('(') + 1 : s.index(',List(')]`` — the OpenIE-4/5 field
    decode (openieFourReader.py:37, openieFiveReader.py:21-23): the text
    between the FIRST '(' and the FIRST ',List('."""
    start = F.instr(col, "(") + F.lit(1)
    return col.substr(start, F.instr(col, ",List(") - start)


def read_ollie(spark: SparkSession, path: str) -> DataFrame:
    """OLLIE output: header line, then
    ``confidence \\t arg1 \\t rel \\t arg2 \\t enabler \\t attribution \\t text``
    (ollieReader.py:12-20). The reference drops exactly the first line
    (``fin.readline()``); a distributed scan has no "first line", so the
    header is identified by its non-numeric confidence field — equivalent
    for any well-formed OLLIE file, and per-file correct when reading a
    directory of them."""
    df = _parts(spark.read.text(path))
    df = df.where(F.element_at("p", 1).try_cast("double").isNotNull())
    return df.select(
        F.element_at("p", 7).alias("sentence"),
        F.element_at("p", 2).alias("arg1"),
        F.element_at("p", 3).alias("rel"),
        F.element_at("p", 4).alias("arg2"),
        F.array().cast("array<string>").alias("extra_args"),
        F.element_at("p", 1).cast("double").alias("confidence"),
    )


def read_openie4(spark: SparkSession, path: str) -> DataFrame:
    """OpenIE-4: ``conf \\t _ \\t arg1F \\t relF \\t arg2F \\t text`` where
    each field is ``Type(payload,List(...))``; lines with any empty field
    in positions 2:5 are skipped (openieFourReader.py:30-40)."""
    df = _parts(spark.read.text(path))
    f1, fr, f2 = (F.get("p", i) for i in (2, 3, 4))
    df = df.where(
        f1.isNotNull() & (f1 != "") & fr.isNotNull() & (fr != "")
        & f2.isNotNull() & (f2 != "")
    )
    return df.select(
        F.element_at("p", 6).alias("sentence"),
        _paren_payload(f1).alias("arg1"),
        _paren_payload(fr).alias("rel"),
        _paren_payload(f2).alias("arg2"),
        F.array().cast("array<string>").alias("extra_args"),
        F.element_at("p", 1).cast("double").alias("confidence"),
    )


def read_openie5(spark: SparkSession, path: str) -> DataFrame:
    """OpenIE-5 (openieFiveReader.py:10-38): like OpenIE-4 but the args
    field packs MULTIPLE ``SimpleArgument(...)`` terms joined by ');', and
    an optional Context field (position 1) prefixes arg1 unless
    ``arg1 + ' ' + rel`` already starts with the context payload."""
    df = _parts(spark.read.text(path))
    ctx, f1, fr, fargs = (F.get("p", i) for i in (1, 2, 3, 4))
    df = df.where(
        f1.isNotNull() & (f1 != "") & fr.isNotNull() & (fr != "")
        & fargs.isNotNull() & (fargs != "")
    )
    arg1 = _paren_payload(f1)
    rel = _paren_payload(fr)
    ctx_payload = _paren_payload(ctx)
    arg1 = F.when(
        ctx.isNotNull()
        & (ctx != "")
        & ~F.startswith(F.concat_ws(" ", arg1, rel), ctx_payload),
        F.concat_ws(" ", ctx_payload, arg1),
    ).otherwise(arg1)
    args = F.transform(F.split(fargs, r"\);"), _paren_payload)
    return df.select(
        F.element_at("p", 6).alias("sentence"),
        arg1.alias("arg1"),
        rel.alias("rel"),
        F.coalesce(F.get(args, 0), F.lit("")).alias("arg2"),
        F.slice(args, 2, 1_000_000).alias("extra_args"),
        F.element_at("p", 1).cast("double").alias("confidence"),
    )


def read_props(spark: SparkSession, path: str) -> DataFrame:
    """PropS: ``conf \\t text \\t rel`` then args at every OTHER column
    from index 4 (0-based) — ``data[4::2]`` (propsReader.py:16-23); blank
    lines skipped."""
    df = _parts(spark.read.text(path))
    # slice is 1-based: elements 5.. are 0-based 4..; keep even 0-based
    # offsets within the slice → original indices 4, 6, 8, …
    args = F.filter(
        F.slice("p", 5, 1_000_000), lambda x, i: i % 2 == F.lit(0)
    )
    return df.select(
        F.element_at("p", 2).alias("sentence"),
        F.coalesce(F.get(args, 0), F.lit("")).alias("arg1"),
        F.element_at("p", 3).alias("rel"),
        F.coalesce(F.get(args, 1), F.lit("")).alias("arg2"),
        F.slice(args, 3, 1_000_000).alias("extra_args"),
        F.element_at("p", 1).cast("double").alias("confidence"),
    )


def numbered_lines(spark: SparkSession, path: str) -> DataFrame:
    """(line_no, sentence) with 1-based per-file line numbers — the ReVerb
    raw-sentences side table (reVerbReader.py:8-9 reads RAW_SENTS_FILE into
    a list indexed by line). zipWithIndex preserves text-file line order,
    so the numbering matches the reference's ``readlines()`` indexing."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda t: (t[1] + 1, t[0].strip())),
        "line_no bigint, sentence string",
    )


def read_reverb(
    spark: SparkSession, path: str, raw_sentences: DataFrame
) -> DataFrame:
    """ReVerb: ``_ \\t sentLineNo \\t arg1 \\t rel \\t arg2 \\t … \\t conf@11``
    (reVerbReader.py:13-22); the sentence text lives in a separate
    raw-sentences file, joined here by 1-based line number
    (``raw_sentences`` from :func:`numbered_lines`). The side table is a
    broadcast equi-join — the reference holds it fully in memory, so
    broadcast is the faithful (and scale-right) translation."""
    df = _parts(spark.read.text(path))
    ext = df.select(
        F.element_at("p", 2).cast("bigint").alias("line_no"),
        F.element_at("p", 3).alias("arg1"),
        F.element_at("p", 4).alias("rel"),
        F.element_at("p", 5).alias("arg2"),
        F.array().cast("array<string>").alias("extra_args"),
        F.element_at("p", 12).cast("double").alias("confidence"),
    )
    return ext.join(F.broadcast(raw_sentences), "line_no").select(*_PRED_COLS)


def read_stanford(spark: SparkSession, path: str) -> DataFrame:
    """Stanford OpenIE: ``_ \\t _ \\t arg1 \\t rel \\t arg2 \\t … \\t conf@11
    \\t text@12`` (stanfordReader.py:12-19)."""
    df = _parts(spark.read.text(path))
    return df.select(
        F.element_at("p", 13).alias("sentence"),
        F.element_at("p", 3).alias("arg1"),
        F.element_at("p", 4).alias("rel"),
        F.element_at("p", 5).alias("arg2"),
        F.array().cast("array<string>").alias("extra_args"),
        F.element_at("p", 12).cast("double").alias("confidence"),
    )


def read_clausie(spark: SparkSession, path: str) -> DataFrame:
    """ClausIE output (clausieReader.py:23-42): a bare line carries the
    sentence; each following 5-field line is one extraction whose bracketed
    args/rel (``s[1:-1]`` quote strip) belong to the MOST RECENT sentence
    line — an inherently sequential, stateful format. The distributed
    version: per-file line numbers (same partition-prefixed
    ``monotonically_increasing_id`` argument as formats._numbered_blocks),
    then ``last(sentence) IGNORE NULLS`` over the per-file line order —
    one window shuffle keyed by file, so a directory of ClausIE files
    parallelizes per-file instead of serializing through the driver the
    way the reference's ``readlines()`` walk does.

    In-file order caveat (same invariant as formats._numbered_blocks):
    ``monotonically_increasing_id`` is ordered by partition INDEX, which
    tracks within-file byte order only while each file maps to a single
    scan split. One ClausIE file larger than
    ``spark.sql.files.maxPartitionBytes`` (default 128 MB — far above any
    real ClausIE output) would rely on Spark's size-descending split
    packing keeping index order, an implementation detail. For such files,
    split them on sentence boundaries first or raise maxPartitionBytes."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_line"),
        F.split("value", "\t").alias("p"),
    ).where(F.size("p") > 0)
    w = (
        Window.partitionBy("_file")
        .orderBy("_line")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    def unquote(i: int) -> Column:
        # s[1:-1] — drop the surrounding quote characters (1-based field i)
        c = f"element_at(p, {i})"
        return F.expr(f"substr({c}, 2, length({c}) - 2)")

    cur = raw.withColumn(
        "sentence",
        F.last(
            F.when(F.size("p") == 1, F.element_at("p", 1)), ignorenulls=True
        ).over(w),
    )
    return cur.where(F.size("p") == 5).select(
        "sentence",
        unquote(2).alias("arg1"),
        unquote(3).alias("rel"),
        unquote(4).alias("arg2"),
        F.array().cast("array<string>").alias("extra_args"),
        F.element_at("p", 5).cast("double").alias("confidence"),
    )


def read_benchmark_gold(spark: SparkSession, path: str) -> DataFrame:
    """Benchmark gold tabbed file (benchmarkGoldReader.py:22-45):
    ``sent \\t rel \\t arg1 \\t arg2 …`` with every field stripped, blank
    lines skipped, confidence fixed at 1.0. Unlike GoldReader
    (formats.read_gold_tsv) there is NO ``C:`` arg filter — args keep
    their positions verbatim."""
    df = _parts(spark.read.text(path))
    args = F.transform(F.slice("p", 3, 1_000_000), F.trim)
    return df.select(
        F.trim(F.element_at("p", 1)).alias("sentence"),
        F.coalesce(F.get(args, 0), F.lit("")).alias("arg1"),
        F.trim(F.element_at("p", 2)).alias("rel"),
        F.coalesce(F.get(args, 1), F.lit("")).alias("arg2"),
        F.slice(args, 3, 1_000_000).alias("extra_args"),
        F.lit(1.0).alias("confidence"),
    )


def to_tabbed_lines(preds: DataFrame) -> DataFrame:
    """The reader family's tabbed SINK (oieReader.py:33-43 get_tabbed /
    output_tabbed): one ``sent \\t conf \\t rel \\t arg1 \\t arg2 [\\t …]``
    line per extraction from the uniform prediction schema.
    :func:`read_tabbed` is its exact inverse. Confidence renders through
    :func:`~openie_with_entities_spark.functions.render.py_float_str`,
    which matches the reference's Python ``str(float)`` / ``map(str, …)``
    including the sub-1e-3 band where a raw double→string cast would go
    scientific (``1.0E-4``) while Python stays positional (``0.0001``) —
    see render.py for the one remaining digit-level caveat ≥ 1e16."""
    args = F.concat(F.array("arg1", "arg2"), F.col("extra_args"))
    return preds.select(
        F.concat_ws(
            "\t",
            "sentence",
            py_float_str(F.col("confidence")),
            "rel",
            F.array_join(args, "\t"),
        ).alias("value")
    )


def split_to_corpus(preds: DataFrame, corpus_sentences: DataFrame) -> DataFrame:
    """Keep only extractions whose sentence appears in a corpus sentence
    list (oieReader.py:12-24 split_to_corpus — the reference's
    train/dev/test splitter). ``corpus_sentences`` needs a ``sentence``
    column; the corpus side is a broadcast semi-join (the reference holds
    ``raw_sents`` fully in memory), so the prediction side never
    shuffles."""
    corpus = corpus_sentences.select(
        F.trim("sentence").alias("sentence")
    ).distinct()
    return preds.join(F.broadcast(corpus), "sentence", "left_semi")


def read_tabbed(spark: SparkSession, path: str) -> DataFrame:
    """Tabbed: ``sent \\t prob \\t pred \\t arg1 \\t arg2 …`` with blank
    lines skipped (tabReader.py:23-48)."""
    df = _parts(spark.read.text(path))
    args = F.slice("p", 4, 1_000_000)
    return df.select(
        F.element_at("p", 1).alias("sentence"),
        F.coalesce(F.get(args, 0), F.lit("")).alias("arg1"),
        F.element_at("p", 3).alias("rel"),
        F.coalesce(F.get(args, 1), F.lit("")).alias("arg2"),
        F.slice(args, 3, 1_000_000).alias("extra_args"),
        F.element_at("p", 2).cast("double").alias("confidence"),
    )
