"""py_float_str: Python str(float) parity for the sink confidence echo
(functions/render.py — ADVICE round 5: a raw double→string cast renders
1e-4 as '1.0E-4' where the reference's map(str, …) writes '0.0001')."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from openie_with_entities_spark.functions.render import py_float_str


def _render(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    return [(r.x, r.s) for r in df.select("x", py_float_str("x").alias("s")).collect()]


BANDS = [
    1.0, 0.61, 0.001, 0.0005, 0.0001, 0.000123, 9.999e-05, 1e-05, 1.5e-05,
    2.5e-09, 0.0, -0.0, -0.0001, -1.5e-07, 0.30000000000000004, 123.456,
    12340000.0, 1.234e7, 1e15, 123456789012345.6, 1e16, 1.7e308, 1e100,
]


def test_all_format_bands_match_python(spark):
    for x, s in _render(spark, BANDS):
        assert s == str(x), f"{x!r}: {s!r} != {str(x)!r}"


def test_specials(spark):
    got = dict(_render(spark, [float("nan"), float("inf"), float("-inf")]))
    import math

    assert got[float("inf")] == "inf" and got[float("-inf")] == "-inf"
    assert [s for x, s in got.items() if math.isnan(x)] == ["nan"]


# render.py's documented scope is values PARSED FROM DECIMAL TEXT (every
# reader in the package): for those, shortest-repr digits agree between
# engines and only the FORMAT bands differ. Arbitrary bit-pattern floats
# (e.g. 2**-24, the min subnormal) hit Java 17's pre-Ryū non-minimal
# digit output — a digit-level divergence no string surgery can repair,
# documented in render.py; a 60k-sample sweep found it bites even short
# decimals only beyond ~1e16 (e.g. 1.84467441e19 → '…099999998e+19'), so
# the property generates ≤10-sig-digit decimals with magnitude < 1e16 —
# still sweeping every repaired format band (exp −12…+6 crosses the
# exp=−4 positional band, both scientific respellings via the mantissa,
# and the 1e7…1e15 big-positional band).
_short_decimals = st.builds(
    lambda m, e, sign: sign * float(f"{m}e{e}"),
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=-12, max_value=6),
    st.sampled_from([1.0, -1.0]),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_short_decimals, min_size=1, max_size=40))
def test_property_matches_python_str(spark, vals):
    # one Spark job per hypothesis list, not per float
    for x, s in _render(spark, vals):
        assert s == str(x), f"{x!r}: {s!r} != {str(x)!r}"


def test_tabbed_sink_small_confidence(spark):
    """End-to-end: the tabbed sink writes 0.0001 the way Python would."""
    from openie_with_entities_spark.sources.readers import (
        read_tabbed,
        to_tabbed_lines,
    )

    preds = spark.createDataFrame(
        [("s one", "a", "r", "b", [], 0.0001), ("s two", "a", "r", "b", [], 0.9)],
        "sentence string, arg1 string, rel string, arg2 string, "
        "extra_args array<string>, confidence double",
    )
    lines = {r.value for r in to_tabbed_lines(preds).collect()}
    assert "s one\t0.0001\tr\ta\tb" in lines
    assert "s two\t0.9\tr\ta\tb" in lines
    # round-trip through the inverse reader is unchanged
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "preds.txt")
        to_tabbed_lines(preds).coalesce(1).write.mode("overwrite").text(path)
        back = read_tabbed(spark, path)
        assert {(r.sentence, r.confidence) for r in back.collect()} == {
            ("s one", 0.0001),
            ("s two", 0.9),
        }


def test_allennlp_sink_small_confidence(spark):
    from openie_with_entities_spark.sources.formats import to_allennlp_lines

    triples = spark.createDataFrame(
        [("s", "a", "r", "b", 0.0005)],
        "sentence string, arg1 string, rel string, arg2 string, confidence double",
    )
    (line,) = [r.value for r in to_allennlp_lines(triples).collect()]
    assert line.endswith("\t0.0005"), line
