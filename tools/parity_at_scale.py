"""Full oracle-parity sweep at a scaled dataset (r4 ran it at 10x; r5 at
50x): every registered query with an oracle runs on Spark AND DuckDB over
the same scaled parquet and must match (rows + columns + values,
order-insensitive). The intentionally quadratic/recursive oracle baselines
are excluded up front, and every other ORACLE runs in its own subprocess
under a hard cap — an oracle that cannot finish at scale is reported as
ORACLE_TIMEOUT (the operator's scaling is the bench's job, not this
sweep's), never as a pass.

Usage: python tools/parity_at_scale.py [sf_dir] [driver_mem] [cap_s] [query ...]
       (trailing query names restrict the sweep — e.g. re-checking the
       queries whose oracles were reformulated for scale)
"""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Oracles are calibrated to DuckDB-1.0 semantics (list_reduce batch bug,
# CTE inlining, lambda re-evaluation — see plans/oracles_analytics.py);
# refuse to "verify" against a version with different semantics.
import duckdb  # noqa: E402

if not duckdb.__version__.startswith("1.0."):
    sys.exit(
        f"oracle suite is calibrated for DuckDB 1.0.x, found "
        f"{duckdb.__version__}; re-audit plans/oracles_analytics.py first"
    )

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf5x"
if len(sys.argv) > 2:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = sys.argv[2]
CAP_S = int(sys.argv[3]) if len(sys.argv) > 3 else 300
ONLY = set(sys.argv[4:])

#: correctness baselines whose ORACLE is quadratic / recursive-CTE —
#: verified at sf0.01 by the driver; unrunnable at 50x by construction.
SKIP = {
    # All four tick-bar oracles were reformulated (r7) as MATERIALIZED
    # prefix + LATERAL next-boundary probes; recursion depth = bar count,
    # so oracle cost scales with data. Measured at 50x: adaptive variants
    # 1202 s / 8115 s (both verified MATCH); the FIXED-threshold variants
    # produce ~6x more bars and cost multiple hours at 50x — verified
    # MATCH at 10x instead (310 s / 1426 s oracles). Default 300 s cap
    # reports them ORACLE_TIMEOUT here, which is the honest outcome.
    # Only the intentionally quadratic n-gram Jaccard baseline is
    # unrunnable at 50x by construction.
    "ngram_jaccard_dups",
    # Per-sample recursive CTE oracles (like the tick bars, the recursion
    # is the BASELINE's cost, not the operator's — the Spark side is one
    # linear mapInPandas decode, covered by the other media sweeps).
    "multimodal_adpcm_features",
    "multimodal_msadpcm_features",
    "multimodal_gsm_features",
    # r14: the stereo twins run TWO per-sample recursions per doc — same
    # recursive-baseline class as their mono parents.
    "multimodal_adpcm_stereo_features",
    "multimodal_msadpcm_stereo_features",
}

_DUCK_SNIPPET = r"""
import sys, duckdb
sys.path.insert(0, sys.argv[1])
from financedatabase_spark.plans.registry import ORACLE_SQL
import os
con = duckdb.connect()
con.execute("SET threads TO " + os.environ.get("PARITY_ORACLE_THREADS", "32"))
# a bounded memory_limit keeps the giant CTE-chain oracles from tripping
# glibc TLS/mmap allocation failures when they run beside the Spark JVM
lim = os.environ.get("PARITY_ORACLE_MEM")
if lim:
    con.execute(f"SET memory_limit='{lim}'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '" + sys.argv[2] + f"/{t}.parquet'")
con.execute("COPY (" + ORACLE_SQL[sys.argv[3]] + ") TO '" + sys.argv[4] + "' (FORMAT PARQUET)")
"""


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            col = pdf[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            pdf[c] = col.astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def oracle_pdf(name: str, out_path: str) -> pd.DataFrame | None:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _DUCK_SNIPPET, REPO, SF, name, out_path],
            capture_output=True, text=True, timeout=CAP_S,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        raise RuntimeError(f"oracle failed: {(r.stderr or '')[-300:]}")
    return pd.read_parquet(out_path)


def main() -> None:
    from financedatabase_spark.plans.registry import ORACLE_SQL, QUERIES
    from financedatabase_spark.session import get_spark

    spark = get_spark("parity_scale")
    tmp = tempfile.mkdtemp(prefix="parity_oracle_")

    ok, bad, timeouts = 0, [], []
    names = [n for n in sorted(ORACLE_SQL) if n not in SKIP]
    if ONLY:
        names = [n for n in names if n in ONLY]
    for name in names:
        out_path = os.path.join(tmp, f"{name}.parquet")
        try:
            b_raw = oracle_pdf(name, out_path)
            if b_raw is None:
                timeouts.append(name)
                print(f"{name}: ORACLE_TIMEOUT (> {CAP_S}s)", flush=True)
                continue
            a = norm(QUERIES[name](spark, SF).toPandas())
            b = norm(b_raw)
            good = len(a) == len(b) and list(a.columns) == list(b.columns)
            if good:
                for c in a.columns:
                    # DECIMAL oracles come back from the parquet hop as
                    # object(Decimal) — compare numerically when either
                    # side is float-like
                    if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
                        good = bool(
                            np.allclose(
                                a[c].astype(float), b[c].astype(float),
                                rtol=1e-9, equal_nan=True,
                            )
                        )
                    else:
                        good = a[c].astype(str).equals(b[c].astype(str))
                    if not good:
                        break
            print(f"{name}: {'MATCH' if good else 'MISMATCH'} ({len(a)} rows)", flush=True)
            if good:
                ok += 1
            else:
                bad.append(name)
            del a, b, b_raw
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}", flush=True)
            bad.append(name)
        finally:
            if os.path.exists(out_path):
                os.unlink(out_path)
    print(
        "RESULT "
        + json.dumps({"ok": ok, "bad": bad, "oracle_timeouts": timeouts, "skipped": sorted(SKIP)}),
        flush=True,
    )


if __name__ == "__main__":
    main()
