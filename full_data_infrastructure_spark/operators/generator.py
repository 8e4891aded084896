"""The synthetic-activity generator as a relational program — SURVEY.md §2 U2-U5.

The reference generates sport activities with a Python row loop
(``activity_generator/sport_generation.py:136-208``): per-sport distance
ranges (``:42-72``), speed-model durations (``:75-113``), bimodal
time-of-day (``:115-134``), weekend-biased participation (``:166-206``).

Re-expressed here as a pure DataFrame program: ``employees x
sequence(dates)`` cross-expansion (the UDTF shape, U5) + column arithmetic.
Instead of ``random.random()`` we use a deterministic LCG on (key, day), and
ALL quantities are integer math (meters, cm/s, seconds) — pure 64-bit
arithmetic any SQL engine reproduces bit-exactly, so the whole generator is
oracle-checkable and fixtures are stable across runs and engines.

Scale: generating n_employees x n_days rows is embarrassingly parallel —
``explode`` happens executor-side, nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from full_data_infrastructure_spark.queries import register
from full_data_infrastructure_spark.sources.parquet import load_table

DATE_START = "2024-01-01"
DATE_END = "2024-03-31"

# sport, distance lo..hi meters, speed lo..hi cm/s. None distance => the
# reference's non-distance sports (sport_generation.py:69-71).
SPORTS = [
    ("running", 3000, 15000, 250, 450),
    ("walking", 2000, 8000, 120, 200),
    ("hiking", 5000, 20000, 100, 180),
    ("biking", 10000, 50000, 400, 1000),
    ("scooter", 5000, 15000, 250, 500),
    ("swimming", 500, 3000, 70, 150),
    ("yoga", None, None, None, None),
]

WEEKEND_PART_PER_MILLE = 150  # sport_generation.py:178 — 15% weekend
WEEKDAY_PART_PER_MILLE = 50  # 5% weekday


def _lcg(key: Column, day: Column, salt: int) -> Column:
    """Deterministic pseudo-uniform integer in [0, 1000)."""
    return (key * 2654435761 + day * 97 + F.lit(salt) * 7919) % 1000


def _idiv(a: Column, b: Column | int) -> Column:
    """Exact integer division for non-negative int64 (operands < 2^53)."""
    return F.floor(a.cast("double") / b).cast("bigint")


def generate_activities(employees: DataFrame, id_col: str) -> DataFrame:
    """U2-U5: employees x days -> participating activity rows."""
    days = F.explode(
        F.sequence(F.lit(DATE_START).cast("date"), F.lit(DATE_END).cast("date"))
    ).alias("activity_date")
    base = employees.select(F.col(id_col).alias("id_employee")).select(
        "id_employee", days
    )
    key = F.col("id_employee").cast("bigint")
    epoch_day = F.datediff(
        F.col("activity_date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    # 1970-01-01 was a Thursday: epoch_day % 7 == 2 => Saturday, 3 => Sunday.
    is_weekend = (epoch_day % 7).isin(2, 3)
    participates = F.when(
        is_weekend, _lcg(key, epoch_day, 1) < WEEKEND_PART_PER_MILLE
    ).otherwise(_lcg(key, epoch_day, 1) < WEEKDAY_PART_PER_MILLE)

    sport_idx = (key * 31 + epoch_day) % len(SPORTS)
    sport = F.element_at(
        F.array(*[F.lit(s[0]) for s in SPORTS]), (sport_idx + 1).cast("int")
    )

    u_dist = _lcg(key, epoch_day, 2)
    u_speed = _lcg(key, epoch_day, 3)
    u_time = _lcg(key, epoch_day, 4)
    u_dur = _lcg(key, epoch_day, 5)

    distance_m = F.lit(None).cast("bigint")
    speed_cms = F.lit(None).cast("bigint")
    for i, (name, lo, hi, s_lo, s_hi) in enumerate(SPORTS):
        if lo is None:
            continue
        distance_m = F.when(
            sport_idx == i, F.lit(lo) + _idiv(u_dist * (hi - lo), 1000)
        ).otherwise(distance_m)
        speed_cms = F.when(
            sport_idx == i, F.lit(s_lo) + _idiv(u_speed * (s_hi - s_lo), 1000)
        ).otherwise(speed_cms)

    # duration: distance/speed for distance sports; 1800-7200 s otherwise
    # (sport_generation.py:106-112). All integer math.
    duration = F.when(
        speed_cms.isNotNull(), _idiv(distance_m * 100, speed_cms)
    ).otherwise(1800 + (u_dur * 54) % 5400)

    # bimodal start hour: 30% in 06-08, 70% in 10-21 (sport_generation.py:126-133)
    start_hour = F.when(u_time < 300, (6 + u_time % 3).cast("int")).otherwise(
        (10 + u_time % 12).cast("int")
    )

    return base.filter(participates).select(
        "id_employee",
        F.date_format("activity_date", "yyyy-MM-dd").alias("activity_day"),
        sport.alias("sport_type"),
        distance_m.alias("distance_m"),
        duration.cast("bigint").alias("duration_sec"),
        start_hour.alias("start_hour"),
    )


def _generator_oracle_sql() -> str:
    sports_arr = ", ".join(f"'{s[0]}'" for s in SPORTS)
    n = len(SPORTS)
    dist_cases = " ".join(
        f"WHEN sport_idx = {i} THEN {lo} + (u_dist * {hi - lo}) // 1000"
        for i, (name, lo, hi, _, _) in enumerate(SPORTS)
        if lo is not None
    )
    speed_cases = " ".join(
        f"WHEN sport_idx = {i} THEN {s_lo} + (u_speed * {s_hi - s_lo}) // 1000"
        for i, (name, lo, hi, s_lo, s_hi) in enumerate(SPORTS)
        if s_lo is not None
    )
    return f"""
    WITH days AS (
        SELECT UNNEST(generate_series(DATE '{DATE_START}', DATE '{DATE_END}',
                                      INTERVAL 1 DAY))::DATE AS activity_date
    ),
    base AS (
        SELECT c_custkey AS id_employee,
               CAST(c_custkey AS BIGINT) AS key,
               activity_date,
               CAST(activity_date - DATE '1970-01-01' AS BIGINT) AS epoch_day
        FROM customer, days
    ),
    rnd AS (
        SELECT *,
               (key * 2654435761 + epoch_day * 97 + 1 * 7919) % 1000 AS r_part,
               (key * 2654435761 + epoch_day * 97 + 2 * 7919) % 1000 AS u_dist,
               (key * 2654435761 + epoch_day * 97 + 3 * 7919) % 1000 AS u_speed,
               (key * 2654435761 + epoch_day * 97 + 4 * 7919) % 1000 AS u_time,
               (key * 2654435761 + epoch_day * 97 + 5 * 7919) % 1000 AS u_dur,
               (key * 31 + epoch_day) % {n} AS sport_idx,
               epoch_day % 7 IN (2, 3) AS is_weekend
        FROM base
    ),
    active AS (
        SELECT *,
               ([{sports_arr}])[CAST(sport_idx AS INT) + 1] AS sport_type,
               CASE {dist_cases} ELSE NULL END AS distance_m,
               CASE {speed_cases} ELSE NULL END AS speed_cms
        FROM rnd
        WHERE (is_weekend AND r_part < {WEEKEND_PART_PER_MILLE})
           OR (NOT is_weekend AND r_part < {WEEKDAY_PART_PER_MILLE})
    )
    SELECT id_employee,
           strftime(activity_date, '%Y-%m-%d') AS activity_day,
           sport_type,
           distance_m,
           CAST(CASE WHEN speed_cms IS NOT NULL
                     THEN (distance_m * 100) // speed_cms
                     ELSE 1800 + (u_dur * 54) % 5400 END AS BIGINT) AS duration_sec,
           CASE WHEN u_time < 300 THEN CAST(6 + u_time % 3 AS INT)
                ELSE CAST(10 + u_time % 12 AS INT) END AS start_hour
    FROM active
    """


@register(
    "generator_activities",
    _generator_oracle_sql(),
    doc="U2-U5 — the reference's Python activity generator "
    "(sport_generation.py:42-208) as a pure relational program: cross "
    "expansion, deterministic LCG randomness, per-sport distance/speed "
    "models, weekend participation bias, bimodal start hour. Integer-only "
    "arithmetic => bit-exact across engines.",
    tags=("reference", "generator"),
)
def _generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return generate_activities(customer, "c_custkey")
