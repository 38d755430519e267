"""Python-compatible float rendering as a native column expression.

The reference's sinks stringify confidences with Python ``str(float)``
(e.g. oie_readers/oieReader.py:33-43 ``map(str, …)``); Spark's
double→string cast uses Java ``Double.toString``, which picks different
FORMATS for the same value in four bands:

  ============  ==============  ==============
  value         Python str      Java toString
  ============  ==============  ==============
  1e-4 … 1e-3   ``0.0001``      ``1.0E-4``    (Java goes scientific < 1e-3)
  < 1e-4        ``1e-05``       ``1.0E-5``    (mantissa/exponent spelling)
  1e7 … <1e16   ``12340000.0``  ``1.234E7``   (Java goes scientific ≥ 1e7)
  ≥ 1e16        ``1e+16``       ``1.0E16``    (spelling again)
  nan/±inf      ``nan``/``inf`` ``NaN``/``Infinity``
  ============  ==============  ==============

:func:`py_float_str` repairs all four bands (plus the specials) with pure
``pyspark.sql.functions`` string surgery on the cast output — no UDF, so
the sink row-render stays whole-stage-codegen'd.

Digit-level caveat: inside a band both engines print the shortest
round-trip digits, but Java ≤ 18 (this sandbox: Java 17) occasionally
emits MORE digits than the true minimum (its pre-Ryū algorithm only
guarantees uniqueness — JDK-4511638 class); Python's repr is always
minimal. Empirically (60k-sample sweep in tests/test_render.py) the
divergence needs either non-decimal-short bit patterns (2**-24,
subnormals) or magnitudes ≥ ~1e16 (1.84467441e19 → '1.8446744099999998e+19').
For decimal-parsed values below 1e16 — every confidence any reader in
this package produces — the two agree exactly, hypothesis-driven.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_float_str(col: Column | str) -> Column:
    """Render a double column exactly as Python ``str(float)`` would
    (see module docstring for scope)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")

    mant = F.substring_index(s, "E", 1)  # Java: sign + d '.' digits, no E
    exp = F.substring_index(s, "E", -1).cast("int")
    neg = F.when(mant.startswith("-"), F.lit("-")).otherwise(F.lit(""))
    mant_abs = F.regexp_replace(mant, "^-", "")
    # Java mantissa is 'd.0' or 'd.d…d' (one leading digit, no trailing
    # zeros beyond the mandatory one) → Python drops the lone '.0'
    mant_clean = F.regexp_replace(mant_abs, r"\.0$", "")
    digits = F.replace(mant_clean, F.lit("."), F.lit(""))
    exp_str = F.abs(exp).cast("string")
    # Python pads exponents to AT LEAST 2 digits; SQL lpad would TRUNCATE
    # a 3-digit exponent to 2, so pad conditionally
    pad2 = F.when(
        F.length(exp_str) < 2, F.concat(F.lit("0"), exp_str)
    ).otherwise(exp_str)

    # exp == -4: Python still positional → 0.000<digits>
    e_m4 = F.concat(neg, F.lit("0.000"), digits)
    # exp <= -5: Python scientific, 'me-0X'
    e_sci_neg = F.concat(neg, mant_clean, F.lit("e-"), pad2)
    # 7 <= exp <= 15: Python still positional; place the point exp+1
    # digits in (right-padding zeros), integral values get '.0'
    n_int = exp + 1
    # rpad/substring take column-typed lengths only through the SQL
    # surface — call_function keeps the whole thing codegen'd
    e_pos_big = F.concat(
        neg,
        F.when(
            F.length(digits) <= n_int,
            F.concat(
                F.call_function("rpad", digits, n_int, F.lit("0")),
                F.lit(".0"),
            ),
        ).otherwise(
            F.concat(
                F.call_function("substring", digits, F.lit(1), n_int),
                F.lit("."),
                F.call_function("substring", digits, n_int + 1),
            )
        ),
    )
    # exp >= 16: Python scientific, 'me+XX'
    e_sci_pos = F.concat(neg, mant_clean, F.lit("e+"), pad2)

    return (
        F.when(F.isnan(c), F.lit("nan"))
        .when(c == F.lit(float("inf")), F.lit("inf"))
        .when(c == F.lit(float("-inf")), F.lit("-inf"))
        .when(~s.contains("E"), s)
        .when(exp == -4, e_m4)
        .when(exp <= -5, e_sci_neg)
        .when(exp <= 15, e_pos_big)
        .otherwise(e_sci_pos)
    )
