"""Alternate extraction-format readers (sources/readers.py) vs the
reference reader family (/root/reference/carb/oie_readers/*.py)."""

import os

import pytest

from openie_with_entities_spark.sources.readers import (
    numbered_lines,
    read_ollie,
    read_openie4,
    read_openie5,
    read_props,
    read_reverb,
    read_stanford,
    read_tabbed,
)

FX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "fixtures", "readers")


def _rows(df):
    return sorted(
        (r.sentence, r.arg1, r.rel, r.arg2, tuple(r.extra_args), r.confidence)
        for r in df.collect()
    )


def test_ollie_skips_header_and_parses_fields(spark):
    got = _rows(read_ollie(spark, os.path.join(FX, "ollie.tsv")))
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.93),
        ("Ada founded Acme Corp .", "Ada", "moved to", "Paris", (), 0.71),
        ("the cat sat on the mat", "the cat", "sat on", "the mat", (), 0.88),
    ])


def test_openie4_paren_decode_and_empty_field_skip(spark):
    got = _rows(read_openie4(spark, os.path.join(FX, "openie4.txt")))
    # middle fixture line has an empty arg2 field → skipped
    # (openieFourReader.py:33-35)
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.95),
        ("the cat sat on the mat", "the cat", "sat on", "the mat", (), 0.82),
    ])


def test_openie5_multi_args_and_context_prefix(spark):
    got = _rows(read_openie5(spark, os.path.join(FX, "openie5.txt")))
    assert got == sorted([
        ("Bob handed the keys to Eve .", "Bob", "handed", "the keys",
         ("to Eve",), 0.91),
        ("In 2020 Ada left Acme .", "In 2020 Ada", "left", "Acme", (), 0.64),
    ])


def test_openie5_context_not_doubled_when_already_prefix(spark, tmp_path):
    # openieFiveReader.py:29: context is only PREPENDED when
    # (arg1 + ' ' + rel) does not already start with it
    line = (
        "0.5\tContext(Ada left,List([0, 8)))"
        "\tSimpleArgument(Ada,List([0, 3)))"
        "\tRelation(left,List([4, 8)))"
        "\tSimpleArgument(Acme,List([9, 13))"
        "\tAda left Acme .\n"
    )
    p = tmp_path / "o5.txt"
    p.write_text(line)
    got = _rows(read_openie5(spark, str(p)))
    assert got == [("Ada left Acme .", "Ada", "left", "Acme", (), 0.5)]


def test_props_every_other_arg_and_blank_lines(spark):
    got = _rows(read_props(spark, os.path.join(FX, "props.txt")))
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.77),
        ("Bob handed the keys to Eve .", "Bob", "handed", "the keys",
         ("to Eve",), 0.55),
    ])


def test_reverb_line_number_join(spark):
    raw = numbered_lines(spark, os.path.join(FX, "reverb_raw_sentences.txt"))
    assert sorted((r.line_no, r.sentence) for r in raw.collect()) == [
        (1, "Ada founded Acme Corp ."),
        (2, "the cat sat on the mat"),
    ]
    got = _rows(read_reverb(spark, os.path.join(FX, "reverb.txt"), raw))
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.89),
        ("the cat sat on the mat", "the cat", "sat on", "the mat", (), 0.67),
    ])


def test_stanford_fixed_columns(spark):
    got = _rows(read_stanford(spark, os.path.join(FX, "stanford.txt")))
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.96),
        ("the cat sat on the mat", "the cat", "sat on", "the mat", (), 0.58),
    ])


def test_tabbed_variadic_args(spark):
    got = _rows(read_tabbed(spark, os.path.join(FX, "tab.txt")))
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.93),
        ("Bob handed the keys to Eve .", "Bob", "handed", "the keys",
         ("to Eve",), 0.71),
    ])


def test_reader_output_feeds_carb_pr_directly(spark):
    """The uniform (sentence, arg1, rel, arg2, extra_args, confidence)
    schema is evaluator-ready: score a reader's output against a gold set
    without any adaptation."""
    from openie_with_entities_spark.evaluate import carb_pr

    pred = read_ollie(spark, os.path.join(FX, "ollie.tsv")).withColumnRenamed(
        "sentence", "sent_key"
    )
    gold = spark.createDataFrame(
        [
            ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp"),
            ("the cat sat on the mat", "the cat", "sat on", "the mat"),
        ],
        "sent_key string, arg1 string, rel string, arg2 string",
    )
    r = carb_pr(gold, pred)
    assert r.zero_conf_recall == 1.0
    assert r.optimal_f1 == 1.0


def test_clausie_stateful_sentence_binding(spark):
    """Each 5-field line binds to the nearest sentence line above it and
    bracketed fields lose their quote chars (clausieReader.py:25-42)."""
    from openie_with_entities_spark.sources.readers import read_clausie

    got = _rows(read_clausie(spark, os.path.join(FX, "clausie.txt")))
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 0.91),
        ("Ada founded Acme Corp .", "Ada", "was", "a founder", (), 0.55),
        ("the cat sat on the mat", "the cat", "sat on", "the mat", (), 0.77),
    ])


def test_benchmark_gold_no_c_filter_and_fixed_confidence(spark):
    """sent \\t rel \\t arg1 \\t args… with confidence pinned to 1.0 and NO
    'C: ' arg dropping (benchmarkGoldReader.py:22-45, contrast
    goldReader.py:31-33)."""
    from openie_with_entities_spark.sources.readers import read_benchmark_gold

    got = _rows(
        read_benchmark_gold(spark, os.path.join(FX, "benchmark_gold.txt"))
    )
    assert got == sorted([
        ("Ada founded Acme Corp .", "Ada", "founded", "Acme Corp", (), 1.0),
        ("the cat sat on the mat", "the cat", "sat on", "the mat",
         ("since noon",), 1.0),
    ])


def test_tabbed_sink_roundtrips_through_read_tabbed(spark, tmp_path):
    """get_tabbed (oieReader.py:33-43) rendered lines parse back to the
    identical rows via its inverse read_tabbed."""
    from openie_with_entities_spark.sources.readers import to_tabbed_lines

    preds = read_ollie(spark, os.path.join(FX, "ollie.tsv"))
    out = str(tmp_path / "tabbed")
    to_tabbed_lines(preds).write.mode("overwrite").text(out)
    back = read_tabbed(spark, out)
    assert _rows(back) == _rows(preds)


def test_split_to_corpus_semi_join(spark):
    """Only extractions of corpus sentences survive, with multiplicity
    preserved (oieReader.py:12-24)."""
    from openie_with_entities_spark.sources.readers import split_to_corpus

    preds = read_ollie(spark, os.path.join(FX, "ollie.tsv"))
    corpus = spark.createDataFrame(
        [("Ada founded Acme Corp .",), ("unseen sentence",)],
        "sentence string",
    )
    kept = split_to_corpus(preds, corpus)
    assert kept.count() == 2
    assert {r.sentence for r in kept.collect()} == {"Ada founded Acme Corp ."}
