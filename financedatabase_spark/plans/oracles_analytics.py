"""Generated DuckDB oracle SQL for the option-analytics queries (U1-U4).

The engine computes implied vol with a vectorized Newton(20)+bisection(60)
solver and Black-Scholes closed forms over the Abramowitz-Stegun 7.1.26 erf
approximation (functions/analytics.py). These oracles re-express the SAME
fixed-iteration algorithms in pure DuckDB SQL so the driver can verify the
pandas-UDF path against an independent engine:

- solver iterations mirror the numpy code op-for-op: same clamps, same
  branch thresholds, same iteration counts. Two generated forms exist:
  `bs_iv_chain` (one CTE per iteration — used by risk_pipeline, fine at
  driver scale) and `bs_iv_walk` (one recursive CTE over narrow state —
  used by implied_vol_bs; the chain's ~80 inlined levels OOM DuckDB's
  planner at 50x verification scale, the walk does not);
- branch decisions (Newton-converged? solvable? vol<=0 fallback?) were
  measured to sit >= 4 orders of magnitude away from their thresholds on
  the synthetic inputs, so both engines take identical branches;
- outputs are quantized with ``floor(x*1e6 + 0.5)/1e6`` on BOTH sides --
  float-only ops that produce bit-identical doubles in Spark and DuckDB --
  because numpy's SIMD exp/log differ from libm at the ULP level, which
  would otherwise break the driver's full-precision value-hash.

The binomial oracle evaluates each CRR lattice (American) as a branchless
nested list fold and bisects via 40 CHAINED MATERIALIZED CTE levels over
(lo, hi) — 43 lattice evaluations per row (target, lo bracket, hi
bracket, 40 mids). Chained-materialized, not recursive: DuckDB 1.0 runs
recursive CTEs single-threaded, while each materialized level
parallelizes the per-row lattice work across threads.

Reference semantics: /root/reference/dbase/DataAPI/Organizers.py:127-185
(BS_IV / Binomial_IV / greeks / resolve_missing_vol row-wise applies).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

#: synthetic option rows (must mirror queries_analytics.synthetic_option_rows)
BASE = """base AS (
  SELECT p_partkey,
         100.0::DOUBLE AS s,
         80.0::DOUBLE + (p_partkey % 41) AS k,
         (p_size % 24 + 1) * 30 / 365.0::DOUBLE AS t,
         0.05::DOUBLE AS r,
         0.01::DOUBLE AS q,
         (p_partkey % 2 = 0) AS is_call,
         0.15::DOUBLE + 0.35::DOUBLE * (p_partkey % 10) / 10.0::DOUBLE AS true_sigma
  FROM part
),
pre AS (
  SELECT *,
         GREATEST(t, 1e-12) AS tt,
         sqrt(GREATEST(t, 1e-12)) AS sq,
         ln(s / k) AS lnsk,
         exp(-q * GREATEST(t, 1e-12)) AS eq,
         exp(-r * GREATEST(t, 1e-12)) AS er
  FROM base
)"""


def q6(expr: str) -> str:
    """Engine-portable 6-decimal quantizer (identical float ops both sides)."""
    return f"floor(({expr}) * 1e6 + 0.5) / 1e6"


def _erf(u: str, tag: str) -> list[str]:
    """A&S 7.1.26 erf of column `u` as lateral aliases ending in e_{tag}."""
    return [
        f"abs({u}) AS a_{tag}",
        f"1.0 / (1.0 + 0.3275911 * a_{tag}) AS w_{tag}",
        f"w_{tag} * (0.254829592 + w_{tag} * (-0.284496736 + w_{tag} * "
        f"(1.421413741 + w_{tag} * (-1.453152027 + w_{tag} * 1.061405429)))) AS pl_{tag}",
        f"sign({u}) * (1.0 - pl_{tag} * exp(-{u} * {u})) AS e_{tag}",
    ]


def _price_cols(sig_expr: str, tag: str, vega: bool = False) -> str:
    """Black-Scholes price (and optionally vega) at `sig_expr` as lateral
    aliases; price lands in pr_{tag}, vega in vg_{tag}.

    Mirrors analytics.bs_price / bs_vega op-for-op. norm_cdf(-x) folds to
    0.5*(1-e): bit-equal to the numpy path because the A&S erf is odd by
    construction (sign(x) factor over |x|).
    """
    cols = [
        f"GREATEST({sig_expr}, 1e-12) AS sg_{tag}",
        f"sg_{tag} * sq AS vs_{tag}",
        f"(lnsk + (r - q + 0.5 * sg_{tag} * sg_{tag}) * tt) / vs_{tag} AS d1_{tag}",
        f"d1_{tag} - vs_{tag} AS d2_{tag}",
        f"d1_{tag} / sqrt(2.0) AS u1_{tag}",
        f"d2_{tag} / sqrt(2.0) AS u2_{tag}",
    ]
    cols += _erf(f"u1_{tag}", f"1{tag}")
    cols += _erf(f"u2_{tag}", f"2{tag}")
    cols.append(
        f"CASE WHEN is_call THEN s * eq * (0.5 * (1.0 + e_1{tag})) - k * er * (0.5 * (1.0 + e_2{tag})) "
        f"ELSE k * er * (0.5 * (1.0 - e_2{tag})) - s * eq * (0.5 * (1.0 - e_1{tag})) END AS pr_{tag}"
    )
    if vega:
        cols.append(
            f"s * eq * (exp(-0.5 * d1_{tag} * d1_{tag}) / sqrt(2.0 * pi())) * sq AS vg_{tag}"
        )
    return ",\n         ".join(cols)


def bs_iv_chain(prefix: str, carry: list[str], tgt: str, out: str) -> tuple[str, str]:
    """CTE chain solving BS implied vol for target-price column `tgt`.

    Expects a CTE named {prefix}_in providing `carry` (which includes the
    target column). Returns (sql_fragment, final_cte_name); the final CTE
    carries `carry` plus the solved vol in `out`. Mirrors analytics.bs_iv:
    solvable bracket, Brenner-Subrahmanyam seed clipped to [0.05, 3],
    20 clipped Newton steps, converged = |price(sig)-tgt| < 1e-6,
    60 bisection steps on [1e-9, 5] for the rest.
    """
    carry_s = ", ".join(carry)
    parts = []
    parts.append(
        f"{prefix}_br AS (\n  SELECT {carry_s}, pr_L AS plo_x, pr_H AS phi_x\n"
        f"  FROM (SELECT {carry_s},\n         {_price_cols('1e-9', 'L')},\n"
        f"         {_price_cols('5.0', 'H')}\n  FROM {prefix}_in)\n)"
    )
    carry2 = carry + ["plo_x", "phi_x"]
    carry2_s = ", ".join(carry2)
    parts.append(
        f"{prefix}_n0 AS (\n  SELECT {carry2_s},\n"
        f"         LEAST(GREATEST(sqrt(2.0 * pi() / tt) * {tgt} / s, 0.05), 3.0) AS sig\n"
        f"  FROM {prefix}_br\n)"
    )
    for i in range(1, 21):
        parts.append(
            f"{prefix}_n{i} AS (\n  SELECT {carry2_s},\n"
            f"         LEAST(GREATEST(sig - CASE WHEN vg_n > 1e-12 "
            f"THEN (pr_n - {tgt}) / GREATEST(vg_n, 1e-12) ELSE 0.0 END, 1e-9), 5.0) AS sig\n"
            f"  FROM (SELECT {carry2_s}, sig,\n         {_price_cols('sig', 'n', vega=True)}\n"
            f"  FROM {prefix}_n{i - 1})\n)"
        )
    parts.append(
        f"{prefix}_cv AS (\n  SELECT {carry2_s}, sig,\n"
        f"         abs(pr_c - {tgt}) < 1e-6 AS cvg,\n"
        f"         ({tgt} > plo_x + 1e-12 AND {tgt} < phi_x - 1e-12 AND t > 0) AS slv\n"
        f"  FROM (SELECT {carry2_s}, sig,\n         {_price_cols('sig', 'c')}\n"
        f"  FROM {prefix}_n20)\n)"
    )
    carry3 = carry2 + ["sig", "cvg", "slv"]
    carry3_s = ", ".join(carry3)
    parts.append(
        f"{prefix}_b0 AS (\n  SELECT {carry3_s}, 1e-9 AS lo, 5.0 AS hi FROM {prefix}_cv\n)"
    )
    for i in range(1, 61):
        parts.append(
            f"{prefix}_b{i} AS (\n  SELECT {carry3_s},\n"
            f"         CASE WHEN pr_m > {tgt} THEN lo ELSE 0.5 * (lo + hi) END AS lo,\n"
            f"         CASE WHEN pr_m > {tgt} THEN 0.5 * (lo + hi) ELSE hi END AS hi\n"
            f"  FROM (SELECT {carry3_s}, lo, hi,\n         {_price_cols('0.5 * (lo + hi)', 'm')}\n"
            f"  FROM {prefix}_b{i - 1})\n)"
        )
    parts.append(
        f"{prefix}_out AS (\n  SELECT {carry_s},\n"
        f"         CASE WHEN NOT slv THEN 0.0 WHEN cvg THEN sig ELSE 0.5 * (lo + hi) END AS {out}\n"
        f"  FROM {prefix}_b60\n)"
    )
    return ",\n".join(parts), f"{prefix}_out"


def _greek_cols(sig_expr: str) -> str:
    """Closed-form greeks at `sig_expr` (mirrors analytics.bs_greeks)."""
    cols = [
        f"GREATEST({sig_expr}, 1e-12) AS sg_g",
        "(lnsk + (r - q + 0.5 * sg_g * sg_g) * tt) / (sg_g * sq) AS d1_g",
        "d1_g - sg_g * sq AS d2_g",
        "d1_g / sqrt(2.0) AS u1_g",
        "d2_g / sqrt(2.0) AS u2_g",
    ]
    cols += _erf("u1_g", "1g")
    cols += _erf("u2_g", "2g")
    cols += [
        "exp(-0.5 * d1_g * d1_g) / sqrt(2.0 * pi()) AS pdf_g",
        "0.5 * (1.0 + e_1g) AS nc1",
        "0.5 * (1.0 - e_1g) AS nc1m",
        "0.5 * (1.0 + e_2g) AS nc2",
        "0.5 * (1.0 - e_2g) AS nc2m",
        "CASE WHEN is_call THEN eq * nc1 ELSE -(eq * nc1m) END AS delta",
        "eq * pdf_g / (s * sg_g * sq) AS gamma",
        "s * eq * pdf_g * sq AS vega",
        "CASE WHEN is_call THEN -s * eq * pdf_g * sg_g / (2 * sq) - r * k * er * nc2 + q * s * eq * nc1 "
        "ELSE -s * eq * pdf_g * sg_g / (2 * sq) + r * k * er * nc2m - q * s * eq * nc1m END AS theta",
        "CASE WHEN is_call THEN k * tt * er * nc2 ELSE -(k * tt * er * nc2m) END AS rho",
        "delta * s AS dollar_delta",
    ]
    return ",\n         ".join(cols)


# ---------------------------------------------------------------------------
# scale-verifiable solver walks. The original bs_iv_chain inlines 80
# solver levels into one expression tree (DuckDB single-use CTEs are
# inlined), which OOMs the planner at 50x. bs_iv_walk keeps the SAME math
# as ONE recursive CTE over narrow (sig, lo, hi) state — constant-size
# expressions, iteration happens executionally, memory is rows x levels of
# a dozen columns. Bit-identical: each level prices with the same
# `_price_cols` laterals in the same order.
#
# NOTE on DuckDB lambdas: list_reduce with a STRUCT accumulator whose step
# is a row-dependent CASE between struct constructions is batch-UNSAFE in
# DuckDB 1.0 (rows collapse to shared results above a few vector rows —
# found while building this; single-row evaluation is correct, so the
# sf0.01 driver gate catches it). Branchless list folds (the binomial
# lattice rollback below, where GREATEST does the branching) verified
# batch-correct. Keep row-dependent branching in recursive CTE levels,
# never inside a list_reduce accumulator.
# ---------------------------------------------------------------------------


def bs_iv_walk(prefix: str, carry: list[str], tgt: str, out: str) -> tuple[str, str]:
    """`bs_iv_chain` as one recursive CTE: levels 0-19 are the Newton
    steps, 20-79 the bisection steps, each pricing one trial sigma with
    the shared `_price_cols` laterals. Same interface and bit-exact
    results; the caller's WITH must be RECURSIVE."""
    carry_s = ", ".join(carry)
    carry2 = carry + ["plo_x", "phi_x"]
    carry2_s = ", ".join(carry2)
    walk = (
        f"{prefix}_br AS (\n"
        f"  SELECT {carry_s}, pr_L AS plo_x, pr_H AS phi_x\n"
        f"  FROM (SELECT {carry_s},\n         {_price_cols('1e-9', 'L')},\n"
        f"         {_price_cols('5.0', 'H')}\n  FROM {prefix}_in)\n"
        f"),\n"
        f"{prefix}_walk({carry2_s}, it, sig, lo, hi) AS (\n"
        f"  SELECT {carry2_s}, 0 AS it,\n"
        f"         CAST(LEAST(GREATEST(sqrt(2.0 * pi() / tt) * {tgt} / s, 0.05), 3.0) AS DOUBLE) AS sig,\n"
        f"         1e-9::DOUBLE AS lo, 5.0::DOUBLE AS hi\n"
        f"  FROM {prefix}_br\n"
        f"  UNION ALL\n"
        f"  SELECT {carry2_s}, it + 1,\n"
        f"         CASE WHEN it < 20 THEN LEAST(GREATEST(sig - CASE WHEN vg_x > 1e-12 "
        f"THEN (pr_x - {tgt}) / GREATEST(vg_x, 1e-12) ELSE 0.0 END, 1e-9), 5.0) ELSE sig END,\n"
        f"         CASE WHEN it < 20 THEN lo WHEN pr_x > {tgt} THEN lo ELSE 0.5 * (lo + hi) END,\n"
        f"         CASE WHEN it < 20 THEN hi WHEN pr_x > {tgt} THEN 0.5 * (lo + hi) ELSE hi END\n"
        f"  FROM (SELECT {carry2_s}, it, sig, lo, hi,\n"
        f"         {_price_cols('CASE WHEN it < 20 THEN sig ELSE 0.5 * (lo + hi) END', 'x', vega=True)}\n"
        f"  FROM {prefix}_walk WHERE it < 80)\n"
        f"),\n"
        f"{prefix}_out AS (\n"
        f"  SELECT {carry_s},\n"
        f"         CASE WHEN NOT ({tgt} > plo_x + 1e-12 AND {tgt} < phi_x - 1e-12 AND t > 0) THEN 0.0\n"
        f"              WHEN abs(pr_c - {tgt}) < 1e-6 THEN sig\n"
        f"              ELSE 0.5 * (lo + hi) END AS {out}\n"
        f"  FROM (SELECT {carry2_s}, sig, lo, hi,\n"
        f"         {_price_cols('sig', 'c')}\n"
        f"  FROM {prefix}_walk WHERE it = 80)\n"
        f")"
    )
    return walk, f"{prefix}_out"


# ---------------------------------------------------------------------------
# per-query oracles
# ---------------------------------------------------------------------------

_CARRY = ["p_partkey", "s", "k", "t", "r", "q", "is_call", "true_sigma",
          "tt", "sq", "lnsk", "eq", "er"]


def implied_vol_bs_oracle() -> str:
    chain, final = bs_iv_walk("iv", _CARRY + ["tgt"], "tgt", "bs_iv_raw")
    return f"""
    WITH RECURSIVE {BASE},
    iv_in AS (
      SELECT {', '.join(_CARRY)}, pr_t AS tgt
      FROM (SELECT {', '.join(_CARRY)},
         {_price_cols('true_sigma', 't')}
      FROM pre)
    ),
    {chain}
    SELECT p_partkey, {q6('tgt')} AS price, true_sigma, {q6('bs_iv_raw')} AS bs_iv
    FROM {final}
    """


def greeks_oracle() -> str:
    return f"""
    WITH {BASE}
    SELECT p_partkey, is_call, true_sigma,
           {q6('delta')} AS delta, {q6('gamma')} AS gamma, {q6('vega')} AS vega,
           {q6('theta')} AS theta, {q6('rho')} AS rho, {q6('dollar_delta')} AS dollar_delta
    FROM (SELECT *,
         {_greek_cols('true_sigma')}
    FROM pre)
    """


def risk_pipeline_oracle() -> str:
    """Organizers-shaped pipeline: price -> IV -> zero-IV fallback from the
    midpoint price -> greeks at resolved IV -> open-interest join -> scrub."""
    chain_a, final_a = bs_iv_chain("iva", _CARRY + ["tgt"], "tgt", "iv_a")
    chain_b, final_b = bs_iv_chain("ivb", _CARRY + ["tgt", "iv_a", "mid"], "mid", "iv_b")

    def scrub(c: str) -> str:
        return f"CASE WHEN isnan({c}) OR isinf({c}) OR {c} IS NULL THEN 0.0 ELSE {c} END"

    return f"""
    WITH {BASE},
    iva_in AS (
      SELECT {', '.join(_CARRY)}, pr_t AS tgt
      FROM (SELECT {', '.join(_CARRY)},
         {_price_cols('true_sigma', 't')}
      FROM pre)
    ),
    {chain_a},
    ivb_in AS (
      SELECT {', '.join(_CARRY)}, tgt, iv_a, tgt * 1.0005 AS mid FROM {final_a}
    ),
    {chain_b},
    resolved AS (
      SELECT {', '.join(_CARRY)}, tgt,
             CASE WHEN iv_a <= 0.0 THEN iv_b ELSE iv_a END AS bs_iv_raw
      FROM {final_b}
    ),
    enriched AS (
      SELECT p_partkey, tgt, bs_iv_raw, delta, gamma, vega, dollar_delta
      FROM (SELECT *,
         {_greek_cols('bs_iv_raw')}
      FROM resolved)
    )
    SELECT p_partkey,
           {q6(scrub('tgt'))} AS close,
           {q6(scrub('bs_iv_raw'))} AS bs_iv,
           {q6(scrub('delta'))} AS delta,
           {q6(scrub('gamma'))} AS gamma,
           {q6(scrub('vega'))} AS vega,
           {q6(scrub('dollar_delta'))} AS dollar_delta,
           CAST(p_partkey % 997 AS BIGINT) AS open_interest
    FROM enriched
    """


def implied_vol_binomial_oracle(steps: int = 32, iters: int = 40) -> str:
    """CRR American binomial IV: bisection as chained MATERIALIZED CTE
    levels over (lo, hi), one full lattice evaluation per level.

    Shaped for DuckDB's executor, measured at 50x verification scale:
    - chained-MATERIALIZED, not recursive (recursive CTEs run
      single-threaded; materialized levels parallelize across threads);
    - the lattice fold is BRANCHLESS (GREATEST does the American
      exercise) — struct-accumulator folds with row-dependent CASE steps
      are batch-unsafe in DuckDB 1.0 (see module note);
    - u and pp are hoisted into materialized COLUMNS per level: a lambda
      re-evaluates captured non-column subtrees (u contains exp()) per
      list element, which cost ~8x the whole evaluation before hoisting;
    - the px column is its own level so the two CASE branches don't
      duplicate the fold.

    43 lattice evaluations per row (target, lo bracket, hi bracket, 40
    mids); bit-exact vs the engine's numpy path (same ops, same order).
    """
    n = steps

    def u_expr(sig: str) -> str:
        return f"exp(GREATEST({sig}, 1e-9) * sqrt(tt / {n}.0))"

    PP = "LEAST(GREATEST((eg - 1.0 / {u}) / ({u} - 1.0 / {u}), 0.0), 1.0)"

    def lattice(u: str, pp: str) -> str:
        term = (f"list_transform(range(0, {n + 1}), "
                f"j -> GREATEST(sgn * (s * power({u}, 2 * j - {n}) - k), 0.0))")
        return (
            f"list_reduce(\n"
            f"      list_prepend({term},\n"
            f"                   list_transform(range(1, {n + 1}), i -> CAST([] AS DOUBLE[]))),\n"
            f"      (vals, x) -> list_transform(range(0, len(vals) - 1),\n"
            f"        j -> GREATEST(dsc * ({pp} * vals[j + 2] + (1.0 - {pp}) * vals[j + 1]),\n"
            f"                      sgn * (s * power({u}, 2 * j - len(vals) + 2) - k))))[1]"
        )

    state = "p_partkey, s, k, t, tt, sgn, true_sigma, dsc, eg, tgt, plo, phi"
    pre_state = state.replace(", tgt, plo, phi", "")
    levels = []
    for i in range(1, iters + 1):
        levels.append(
            f"b{i}u AS MATERIALIZED (\n"
            f"      SELECT {state}, lo, hi, {u_expr('(0.5 * (lo + hi))')} AS u FROM b{i - 1}\n"
            f"    )"
        )
        levels.append(
            f"b{i}w AS MATERIALIZED (\n"
            f"      SELECT {state}, lo, hi, u, {PP.format(u='u')} AS pp FROM b{i}u\n"
            f"    )"
        )
        levels.append(
            f"b{i}p AS MATERIALIZED (\n"
            f"      SELECT {state}, lo, hi, {lattice('u', 'pp')} AS px FROM b{i}w\n"
            f"    )"
        )
        levels.append(
            f"b{i} AS (\n"
            f"      SELECT {state},\n"
            f"             CASE WHEN px > tgt THEN lo ELSE 0.5 * (lo + hi) END AS lo,\n"
            f"             CASE WHEN px > tgt THEN 0.5 * (lo + hi) ELSE hi END AS hi\n"
            f"      FROM b{i}p\n"
            f"    )"
        )
    chain = ",\n    ".join(levels)
    ev_levels = (
        f"evu AS MATERIALIZED (\n"
        f"      SELECT {pre_state},\n"
        f"             {u_expr('true_sigma')} AS u_t,\n"
        f"             {u_expr('1e-6')} AS u_l,\n"
        f"             {u_expr('5.0')} AS u_h\n"
        f"      FROM pre\n"
        f"    ),\n"
        f"    evw AS MATERIALIZED (\n"
        f"      SELECT {pre_state}, u_t, u_l, u_h,\n"
        f"             {PP.format(u='u_t')} AS pp_t,\n"
        f"             {PP.format(u='u_l')} AS pp_l,\n"
        f"             {PP.format(u='u_h')} AS pp_h\n"
        f"      FROM evu\n"
        f"    ),\n"
        f"    ev AS MATERIALIZED (\n"
        f"      SELECT {pre_state},\n"
        f"             {lattice('u_t', 'pp_t')} AS tgt,\n"
        f"             {lattice('u_l', 'pp_l')} AS plo,\n"
        f"             {lattice('u_h', 'pp_h')} AS phi\n"
        f"      FROM evw\n"
        f"    )"
    )
    return f"""
    WITH base AS (
      SELECT p_partkey,
             100.0::DOUBLE AS s,
             80.0::DOUBLE + (p_partkey % 41) AS k,
             (p_size % 24 + 1) * 30 / 365.0::DOUBLE AS t,
             0.05::DOUBLE AS r,
             0.01::DOUBLE AS q,
             CASE WHEN p_partkey % 2 = 0 THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS sgn,
             0.15::DOUBLE + 0.35::DOUBLE * (p_partkey % 10) / 10.0::DOUBLE AS true_sigma
      FROM part
      WHERE p_partkey % 4 = 0
    ),
    pre AS (
      SELECT p_partkey, s, k, t, GREATEST(t, 1e-12) AS tt, sgn, true_sigma,
             exp(-r * (GREATEST(t, 1e-12) / {n}.0)) AS dsc,
             exp((r - q) * (GREATEST(t, 1e-12) / {n}.0)) AS eg
      FROM base
    ),
    {ev_levels},
    b0 AS (
      SELECT {state}, 1e-6::DOUBLE AS lo, 5.0::DOUBLE AS hi FROM ev
    ),
    {chain}
    SELECT p_partkey,
           {q6('tgt')} AS price,
           true_sigma,
           {q6('CASE WHEN tgt > plo AND tgt < phi AND t > 0 THEN 0.5 * (lo + hi) ELSE 0.0 END')} AS binomial_iv
    FROM b{iters}
    """
