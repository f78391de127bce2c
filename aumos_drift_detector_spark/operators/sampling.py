"""Deterministic sampling & split-assignment for training-data pipelines.

Data mixing ("give me exactly N rows of web, M of code") and train/val/test
assignment must be DETERMINISTIC — reruns, resumes, and audits need the
same rows back — and engine-portable, so every hash here is md5 over the
row's id plus a salt (identical hex in Spark, DuckDB, and any other engine)
rather than an engine-private hash like xxhash64.

Scale notes: `stratified_quota_sample` ranks inside each stratum with a
window — one shuffle on the strata column; quotas are a tiny broadcast dim.
Skewed strata are fine (the window sorts within partitions of one
stratum's rows — for pathological single-stratum inputs prefer a higher
`spark.sql.shuffle.partitions` or pre-salt upstream). `deterministic_split`
is a pure column expression (no shuffle at all): rows carry their split
label from a hex-prefix range over md5, so ANY subset of the data —
including a single file read in isolation — gets the same assignment, the
property that makes backfills and distributed writes consistent.

No reference analogue (the reference has no sampling surface); these are
LLM-pipeline operators in the dedup/text family.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: md5 produces 32 lowercase hex chars; a threshold at fraction f of the
#: keyspace is the hex literal of floor(f * 16^8) over the FIRST 8 chars —
#: string comparison on the full digest then matches numeric comparison.
_HEX_WIDTH = 8


def _row_hash(id_col: Column, salt: str) -> Column:
    """Portable deterministic per-row draw: md5 hex of ``id || '|' || salt``."""
    return F.md5(F.concat_ws("|", id_col.cast("string"), F.lit(salt)))


def _hex_threshold(fraction: float) -> str:
    """Hex-string threshold t such that P(md5_hex < t) == fraction.

    A cumulative fraction >= 1.0 must match EVERY digest: format(16**8)
    would yield the 9-char '100000000', which sorts BELOW most 32-char
    digests lexicographically — return 'g' instead (greater than every
    hex char, so ``md5_hex < 'g'`` is always true).
    """
    bound = int(fraction * (16 ** _HEX_WIDTH))
    if bound >= 16 ** _HEX_WIDTH:
        return "g"
    return format(max(0, bound), f"0{_HEX_WIDTH}x")


def stratified_quota_sample(
    df: DataFrame,
    strata_col: str,
    quotas: Mapping[str, int],
    id_col: str,
    salt: str = "v1",
) -> DataFrame:
    """Exactly ``quotas[stratum]`` rows per stratum, deterministically.

    Rows rank within their stratum by the portable md5 draw (ties broken by
    the id itself) and the first ``quota`` survive. Determinism assumes
    UNIQUE ids: two rows sharing an id also share both sort keys, so which
    of them crosses a quota boundary is engine-arbitrary — dedup ids
    upstream if payloads differ. Changing ``salt`` redraws the whole sample;
    strata absent from ``quotas`` are dropped. A stratum smaller than its
    quota returns all of its rows (no error — audit counts downstream).
    """
    if not quotas:
        # "strata absent from quotas are dropped" — an empty quota map
        # drops everything (createDataFrame([]) can't infer a schema)
        return df.where(F.lit(False))
    qdf = F.broadcast(
        df.sparkSession.createDataFrame(
            [(k, int(v)) for k, v in quotas.items()],
            [strata_col, "_quota"],
        )
    )
    w = Window.partitionBy(strata_col).orderBy(
        _row_hash(F.col(id_col), salt), F.col(id_col).cast("string")
    )
    return (
        df.join(qdf, strata_col)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    prob_col: Column | str,
    salt: str = "v1",
) -> DataFrame:
    """Keep each row independently with its OWN probability, deterministically.

    The importance-resampling primitive behind quality-weighted data mixing
    (DoReMi / DSIR-style selection): ``prob_col`` is a per-row keep
    probability (any double expression — a quality score, a source weight
    join, a dedup-count discount) and the keep decision is
    ``draw < floor(clamp(p, 0, 1) * 2^32)`` where ``draw`` is the first 8
    md5 hex chars of ``id|salt`` as an integer. The comparison is NUMERIC,
    so p = 0 keeps nothing and p = 1 keeps everything exactly (no
    hex-string edge cases), and IEEE double arithmetic makes the decision
    bit-reproducible across engines and reruns.

    Pure column expression — no shuffle, stable under repartitioning and
    subsetting, consistent across tables sharing ``id_col`` (same contract
    as deterministic_split). When COMPOSING with deterministic_split (or a
    second weighted_sample), give each stage a DISTINCT salt: they share
    the md5(id|salt) draw, so one salt would correlate the decisions
    (plans.corpus_pipeline does this automatically).
    """
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    h = _row_hash(F.col(id_col), salt)
    draw = F.conv(F.substring(h, 1, _HEX_WIDTH), 16, 10).cast("long")
    bound = F.floor(
        F.least(F.greatest(p.cast("double"), F.lit(0.0)), F.lit(1.0))
        * F.lit(float(16 ** _HEX_WIDTH))
    ).cast("long")
    return df.where(draw < bound)


def mixture_rebalance(
    df: DataFrame,
    domain_col: str,
    target: Mapping[str, float],
    id_col: str,
    salt: str = "v1",
) -> DataFrame:
    """Downsample-only resampling toward a target domain mixture.

    The corpus-mixing primitive ("make the output 40% web / 40% code /
    20% books" — the knob DoReMi/Pile-style recipes tune): ``target``
    maps domain value -> desired weight (normalized internally). Each
    domain gets acceptance probability ``p_d = round(min(1, C·w_d/n_d), 6)``
    where ``n_d`` is the observed row count and ``C = min_d(n_d/w_d)`` is
    the largest scale at which no domain needs upsampling, so the expected
    output hits the target mixture exactly while only ever DROPPING rows.
    The per-row keep decision is the portable md5 draw of
    :func:`weighted_sample` — deterministic in (``id_col``, ``salt``),
    engine-replayable, stable under repartitioning.

    Domains absent from ``target`` (or with weight 0) are dropped
    outright; zero-weight domains do not cap ``C``. The bottleneck domain
    (argmin n/w) keeps every row. All probability arithmetic is plain
    IEEE double division/multiplication rounded at 6 decimals, so an
    external SQL engine replaying the same counts reproduces the exact
    row set.

    Scale shape: one map-side-combined count per domain (tiny frame),
    driver-free broadcast of |domains| probabilities back onto the scan,
    then a pure column-expression filter — the corpus itself never
    shuffles. No reference analogue (LLM-pipeline operator family).
    """
    if not target:
        return df.where(F.lit(False))
    if any(v < 0 for v in target.values()):
        raise ValueError("target weights must be non-negative")
    total = float(sum(target.values()))
    if total <= 0:
        raise ValueError("target weights must sum to a positive mass")
    norm = {str(k): float(v) / total for k, v in target.items()}
    tdf = F.broadcast(
        df.sparkSession.createDataFrame(
            [(k, w) for k, w in norm.items()], [domain_col, "_w"]
        )
    )
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(tdf, domain_col)
    )
    # the scale C = min(n/w over positive weights) as a whole-frame window
    # over the POST-AGGREGATION |domains|-row frame: the corpus-wide count
    # aggregation is computed ONCE (a cross-joined separate agg would make
    # Catalyst evaluate it twice — one extra full-corpus scan at 100 TB),
    # and the single-partition exchange moves |domains| rows, not data
    scale = F.min(
        F.when(F.col("_w") > 0, F.col("_n").cast("double") / F.col("_w"))
    ).over(Window.partitionBy())
    probs = counts.select(
        F.col(domain_col),
        F.round(
            F.least(
                F.lit(1.0),
                scale * F.col("_w") / F.col("_n").cast("double"),
            ),
            6,
        ).alias("_p"),
    )
    return weighted_sample(
        df.join(F.broadcast(probs), domain_col), id_col, F.col("_p"), salt
    ).drop("_p")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float],
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label from id-hash alone (no shuffle).

    ``fractions`` maps label -> probability mass (must sum to ~1; the last
    label absorbs rounding). Assignment is a hex-prefix range over the md5
    draw, so it is stable under repartitioning, subsetting, and reruns —
    two tables sharing ``id_col`` values get CONSISTENT splits (a labels
    table and a features table never disagree about which side a row is on).
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    total = float(sum(fractions.values()))
    if not (0.999 <= total <= 1.001):
        raise ValueError(f"fractions must sum to 1 (got {total})")
    h = _row_hash(F.col(id_col), salt)
    labels = list(fractions.items())
    expr: Column | None = None
    acc = 0.0
    # CASE WHEN h < t1 THEN l1 WHEN h < t2 THEN l2 ... ELSE l_last
    for label, frac in labels[:-1]:
        acc += float(frac)
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1][0]
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, F.lit(out) if isinstance(out, str) else out)
