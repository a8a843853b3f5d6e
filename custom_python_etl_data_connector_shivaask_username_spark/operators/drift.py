"""X26: distribution-drift monitor for continuous ingestion.

A polling connector (the reference's README.md:29 "audits or updates"
loop) re-ingests forever; the question nobody's schema check answers is
whether TODAY's batch still looks like the corpus the pipeline was
tuned on. This module renders the standard drift check — population
stability index (PSI) over fixed histogram buckets — relational:

1. ``freeze_histogram``: bucket a numeric column of the REFERENCE
   frame into ``n_buckets`` equal-width bins between its observed
   [lo, hi] (bounds become part of the frozen spec, so every future
   batch buckets identically), one tiny (bucket, share) frame out.
2. ``drift_psi``: bucket the new batch with the SAME frozen spec, join
   shares, PSI = Σ (p_i − q_i) · ln(p_i / q_i). PSI < 0.1 is stable,
   0.1–0.25 drifting, > 0.25 action (the industry rule of thumb —
   emitted as a ``status`` column, thresholds overridable).

Determinism doctrine (same as X21): shares are exact rational counts;
LN (the one transcendental) is quantized to integer micro-units via
``floor(x·1e6 + 0.5)`` — pure binary double arithmetic, identical on
any engine/layout — so the PSI of the same two frames is bit-stable
under repartitioning (pinned).

100 TB shape: each side is ONE bucket-keyed aggregation (counts), the
joined histogram is ``n_buckets`` rows — driver/metadata scale. The
smoothing floor (``alpha``) keeps empty buckets finite, exactly the
add-k trick the LM uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: quantum for LN outputs — see module docstring / llm_text.LM_QUANT
PSI_QUANT = 1_000_000.0

#: industry-standard PSI bands
PSI_STABLE = 0.1
PSI_ACTION = 0.25


def freeze_histogram(
    ref: DataFrame, col: str, n_buckets: int = 10
) -> tuple[dict, DataFrame]:
    """Freeze a bucket spec on the reference frame and return
    ``(spec, shares)`` — spec carries the bounds every future batch
    must bucket with; shares is the (bucket, ref_share) frame."""
    lo, hi = ref.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi")
    ).first()
    if lo is None:
        raise ValueError(
            f"cannot freeze a histogram on '{col}': reference frame has "
            "no non-null rows"
        )
    spec = {
        "col": col,
        "lo": float(lo),
        "hi": float(hi),
        "n_buckets": int(n_buckets),
    }
    return spec, _bucket_shares(ref, spec, "ref_share")


def _bucket_expr(spec: dict) -> F.Column:
    lo, hi, n = spec["lo"], spec["hi"], spec["n_buckets"]
    width = (hi - lo) / n if hi > lo else 1.0
    raw = F.floor((F.col(spec["col"]) - F.lit(lo)) / F.lit(width))
    # clamp: values at/above hi (or beyond, in a drifted batch) land in
    # the edge buckets rather than inventing new ones
    return F.least(
        F.greatest(raw, F.lit(0)), F.lit(n - 1)
    ).cast("int")


def _bucket_shares(df: DataFrame, spec: dict, share_col: str) -> DataFrame:
    n = spec["n_buckets"]
    rows = df.filter(F.col(spec["col"]).isNotNull())
    counts = rows.groupBy(_bucket_expr(spec).alias("bucket")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    total = rows.agg(F.count(F.lit(1)).alias("_total"))
    # dense bucket spine so empty bins appear with count 0; the 1-row
    # total broadcasts (the guarded-J9 scalar idiom, as in TF-IDF)
    spine = df.sparkSession.range(n).select(
        F.col("id").cast("int").alias("bucket")
    )
    return (
        spine.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            # try_divide: an EMPTY batch has total 0; NULL shares (not
            # an ANSI DIVIDE_BY_ZERO crash) flow to the no_data status
            F.try_divide(
                F.coalesce("_c", F.lit(0)), F.col("_total")
            ).alias(share_col),
        )
    )


def drift_psi(
    batch: DataFrame,
    spec: dict,
    ref_shares: DataFrame,
    alpha: float = 1e-4,
) -> DataFrame:
    """One-row drift report: (psi, status) of ``batch`` vs the frozen
    reference histogram. ``alpha`` floors both shares so empty buckets
    contribute finitely (standard PSI practice)."""
    q = _bucket_shares(batch, spec, "batch_share")
    p = F.col("ref_share") + F.lit(alpha)
    qq = F.col("batch_share") + F.lit(alpha)
    # quantized-LN doctrine: identical binary arithmetic on any layout
    term_q = F.floor(F.log(p / qq) * F.lit(PSI_QUANT) + F.lit(0.5)).cast(
        "long"
    )
    joined = ref_shares.join(q, "bucket")
    # per-bucket terms are identical doubles on any layout; the decimal
    # cast fixes each to an exact value so the SUM is order-free too
    psi = (
        joined.agg(
            (
                F.sum(((p - qq) * term_q).cast("decimal(27,12)"))
                .cast("double")
                / F.lit(PSI_QUANT)
            ).alias("psi")
        )
        .select(F.round("psi", 6).alias("psi"))
        .select(
            "psi",
            # no_data first: an EMPTY batch (idle ingest tick) yields
            # 0/0 -> NULL shares -> NULL psi, and a bare otherwise()
            # chain would mislabel that NULL as an 'action' alarm
            # (round-6 review finding). Bands are [0,0.1) stable,
            # [0.1,0.25] drifting, >0.25 action — <= on the upper
            # bound so an exact 0.25 reads as the docstring says.
            F.when(F.col("psi").isNull(), "no_data")
            .when(F.col("psi") < PSI_STABLE, "stable")
            .when(F.col("psi") <= PSI_ACTION, "drifting")
            .otherwise("action")
            .alias("status"),
        )
    )
    return psi
