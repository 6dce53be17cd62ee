#!/usr/bin/env python
"""One-shot mechanical splitter: moonshot_spark/queries.py (13.5k LoC,
236 registrations) -> moonshot_spark/queries/ package with per-domain
modules, preserving every top-level node byte-for-byte (VERDICT r8 #5).

Each top-level node (with the comment block that precedes it) moves
wholesale into the module its start line maps to in DOMAIN_MAP below.
Cross-module name references are resolved with explicit imports; a
dependency-cycle check fails loudly rather than emitting a broken
package.  Run once from the repo root; reviewed + committed output is
the artifact, this script is kept for audit.
"""
from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "moonshot_spark", "queries.py")
PKG = os.path.join(REPO, "moonshot_spark", "queries")

# (first_line, domain): a node whose start line is >= first_line and
# < the next entry's first_line belongs to that domain.  Derived from
# the section banners of the original file.
DOMAIN_MAP = [
    (1, "_base"),          # docstring, imports, registry, shared fragments
    (85, "panel"),         # OHLCV panel, window primitives, spine, crosssec
    (233, "warehouse"),    # lineitem agg, star/outer joins, topk, sessions
    (448, "backtest"),     # flagship backtest
    (512, "datapipe"),     # text / dedup / similarity / multimodal
    (1400, "backtest"),    # trade pipeline, weights, commissions/slippage
    (2215, "warehouse"),   # as-of, pivot
    (2319, "backtest"),    # ML scoring (D23)
    (2356, "warehouse"),   # semi/anti, rollup, scalars
    (2491, "backtest"),    # benchmark returns
    (2526, "warehouse"),   # percentiles, JSON
    (2662, "panel"),       # resample / rebalance
    (2688, "datapipe"),    # IVF centroids, embedding near-dups
    (2883, "streaming"),   # tick stream -> OHLCV
    (2944, "datapipe"),    # IVF ANN, winnowing, BPE-ish counting
    (3138, "warehouse"),   # TPC-H Q3, set ops, Q5, subqueries
    (3551, "panel"),       # range frames, W10 rebalancing
    (3626, "warehouse"),   # approx aggregates
    (3681, "datapipe"),    # corpus top terms
    (3957, "warehouse"),   # funnel
    (4005, "datapipe"),    # quality filtering
    (4142, "backtest"),    # intraday backtest, performance metrics
    (4439, "panel"),       # business-day arithmetic
    (4465, "warehouse"),   # rank-function family
    (4499, "backtest"),    # momentum strategy
    (4572, "analytics"),   # benchmark correlation
    (4731, "panel"),       # unpivot panel
    (4758, "backtest"),    # portfolio rollup, min-commission
    (4977, "panel"),       # interpolation, completeness audit
    (5109, "warehouse"),   # attribution, market-basket
    (5233, "analytics"),   # purged K-fold CV
    (5296, "datapipe"),    # length terciles
    (5341, "warehouse"),   # co-purchase graph: PageRank + triangles
    (5536, "warehouse"),   # TPC-H Q4/Q14/Q19
    (5638, "analytics"),   # Markov transitions
    (5681, "datapipe"),    # lexical diversity
    (5724, "backtest"),    # round-trip holding periods
    (5813, "analytics"),   # MAD outliers, deciles, chi-square
    (5859, "warehouse"),   # price deciles
    (5892, "analytics"),   # chi-square
    (5959, "datapipe"),    # temperature mixing
    (6007, "backtest"),    # vol-targeted weights
    (6093, "warehouse"),   # RFM, profiling
    (6180, "backtest"),    # universe screening
    (6220, "warehouse"),   # cohort LTV
    (6277, "analytics"),   # seasonality
    (6303, "panel"),       # EWMA
    (6350, "warehouse"),   # sketch-accuracy contract
    (6385, "backtest"),    # limit-order fill
    (6429, "analytics"),   # overnight gaps, pairs z-score
    (6524, "datapipe"),    # raw-SQL lang confusion matrix
    (6585, "backtest"),    # index reconstitution
    (6652, "analytics"),   # walk-forward AR(1)
    (6789, "panel"),       # intraday volume curve
    (6838, "analytics"),   # event study
    (6916, "datapipe"),    # cross-source duplication
    (6957, "analytics"),   # Ljung-Box
    (7040, "backtest"),    # momentum deciles
    (7128, "analytics"),   # Amihud, price-path similarity, VR test
    (7352, "backtest"),    # Donchian
    (7399, "analytics"),   # underwater periods
    (7457, "datapipe"),    # sparse cosine join, span corruption
    (7619, "warehouse"),   # dq validation, RI, PK audit, session paths,
    (7928, "datapipe"),    # embedding drift, record linkage
    (8021, "analytics"),   # two-sample t
    (8118, "backtest"),    # VaR / ES
    (8205, "analytics"),   # James-Stein
    (8299, "panel"),       # dollar bars, contract stitching
    (8435, "analytics"),   # information coefficient
    (8538, "panel"),       # market-session tagging
    (8596, "warehouse"),   # MATCH_RECOGNIZE, heavy hitters
    (8709, "datapipe"),    # retention funnel, packing sweep, split balance
    (8923, "warehouse"),   # TPC-H Q6/Q13/Q8/Q15/Q17
    (9176, "streaming"),   # streaming dollar bars
    (9258, "warehouse"),   # lead-time quantiles
    (9299, "analytics"),   # TA indicator stack
    (9557, "datapipe"),    # BM25, DSIR
    (9652, "analytics"),   # rolling beta/alpha
    (9757, "datapipe"),    # Matryoshka, MinHash accuracy
    (9890, "backtest"),    # Bollinger, VaR exceedance, Kelly
    (10028, "warehouse"),  # Pareto skyline
    (10079, "datapipe"),   # dedup canonical selection
    (10191, "backtest"),   # Kelly sizing
    (10277, "analytics"),  # Fama-MacBeth
    (10380, "warehouse"),  # Benford
    (10455, "analytics"),  # Newey-West, bootstrap Sharpe
    (10679, "datapipe"),   # SemDeDup, prefix cache, spec decoding
    (10872, "analytics"),  # Kaplan-Meier
    (10981, "warehouse"),  # FIFO lots, aging, TPC-H Q1/Q9/Q12/Q21
    (11364, "datapipe"),   # Zipf, shuffle, k-means
    (11586, "warehouse"),  # snapshot diff
    (11653, "datapipe"),   # wave 7, PCA, label propagation
    (12561, "analytics"),  # cointegration, PC1 outliers, Markowitz
    (13038, "datapipe"),   # incremental dedup, RRF, LSH recall, waterfill
]

MODULE_ORDER = ["panel", "warehouse", "backtest", "datapipe",
                "analytics", "streaming"]

MODULE_DOC = {
    "panel": "Panel derivation, per-sid window primitives, spines, "
             "resampling, intraday/microstructure bars.",
    "warehouse": "Warehouse-style relational queries: TPC-H shapes, "
                 "joins, rollups, set ops, audits, sessionization.",
    "backtest": "Backtest/trade pipeline queries: strategies, weights, "
                "commissions, slippage, portfolio analytics.",
    "datapipe": "LLM training-data pipeline queries: text quality, "
                "dedup, similarity, corpus mixing, embeddings.",
    "analytics": "Statistical / time-series analytics: hypothesis "
                 "tests, regressions, risk statistics.",
    "streaming": "Structured Streaming queries reconciled to batch "
                 "oracles.",
}

HEADER_IMPORTS = """\
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonshot_spark.functions.crosssec import xs_rank, xs_sum, xs_zscore
from moonshot_spark.functions.window import (
    days_since_prev, diff, ffill, pct_change, shift,
)
from moonshot_spark.queries._base import (
    PANEL_SQL, ORACLES, QUERIES, register,
)
from moonshot_spark.sources.parquet import events_to_panel, load_table
"""

HEADER_NAMES = {
    "DataFrame", "SparkSession", "Window", "F", "xs_rank", "xs_sum",
    "xs_zscore", "days_since_prev", "diff", "ffill", "pct_change",
    "shift", "PANEL_SQL", "ORACLES", "QUERIES", "register",
    "events_to_panel", "load_table", "annotations",
}


def domain_of(lineno: int) -> str:
    dom = DOMAIN_MAP[0][1]
    for start, d in DOMAIN_MAP:
        if lineno >= start:
            dom = d
        else:
            break
    return dom


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # node spans: each node owns everything from the previous node's end
    # (decorators + preceding comments ride with the node)
    spans = []
    prev_end = 0
    for node in tree.body:
        start = min([node.lineno] + [d.lineno for d in getattr(
            node, "decorator_list", [])])
        spans.append((prev_end, node.end_lineno, node, start))
        prev_end = node.end_lineno
    trailing = "".join(lines[prev_end:])
    assert not trailing.strip(), f"unowned trailing code: {trailing[:200]}"

    chunks: dict[str, list[str]] = {d: [] for d in MODULE_ORDER}
    chunks["_base"] = []
    defined_in: dict[str, str] = {}   # top-level name -> module
    module_nodes: dict[str, list[ast.AST]] = {d: [] for d in chunks}

    for lead, end, node, start in spans:
        dom = domain_of(start)
        text = "".join(lines[lead:end])
        chunks[dom].append(text)
        module_nodes[dom].append(node)
        if isinstance(node, ast.FunctionDef):
            defined_in.setdefault(node.name, dom)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (node.targets if isinstance(node, ast.Assign)
                       else [node.target])
            for t in targets:
                if isinstance(t, ast.Name):
                    defined_in.setdefault(t.id, dom)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                defined_in.setdefault(
                    (alias.asname or alias.name).split(".")[0], dom)

    # cross-module references -> explicit imports
    import builtins
    builtin_names = set(dir(builtins))
    needs: dict[str, dict[str, set]] = {d: {} for d in MODULE_ORDER}
    for dom in MODULE_ORDER:
        used = set()
        mod_tree = ast.parse("".join(chunks[dom]))
        for n in ast.walk(mod_tree):
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                used.add(n.id)
        local = {name for name, d in defined_in.items() if d == dom}
        for name in sorted(used - local - HEADER_NAMES - builtin_names):
            src_mod = defined_in.get(name)
            if src_mod is None:
                continue  # closure/param name shadowing; ast-walk noise
            if src_mod == "_base":
                continue  # already in the header import
            needs[dom].setdefault(src_mod, set()).add(name)

    # cycle check on the cross-module import graph
    edges = {d: set(needs[d]) for d in MODULE_ORDER}
    for d, deps in edges.items():
        for dep in deps:
            if d in edges.get(dep, set()):
                sys.exit(f"IMPORT CYCLE between {d} and {dep}")

    os.makedirs(PKG, exist_ok=True)
    for dom in MODULE_ORDER:
        extra = ""
        for src_mod in sorted(needs[dom]):
            names = ", ".join(sorted(needs[dom][src_mod]))
            extra += (f"from moonshot_spark.queries.{src_mod} import "
                      f"{names}\n")
        body = "".join(chunks[dom])
        with open(os.path.join(PKG, f"{dom}.py"), "w") as f:
            f.write(f'"""{MODULE_DOC[dom]}\n\nSplit from the original '
                    f'single-module catalog; bodies unchanged."""\n'
                    f"{HEADER_IMPORTS}{extra}\n\n{body}")

    # _base: everything before line 85 (docstring, imports, registry,
    # shared fragments) verbatim
    with open(os.path.join(PKG, "_base.py"), "w") as f:
        f.write("".join(chunks["_base"]))

    mod_imports = "\n".join(
        f"from moonshot_spark.queries import {d} as _{d}  # noqa: F401,E402"
        for d in MODULE_ORDER)
    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write(f'''"""Query catalog package: importing this module
registers every catalog query (same public surface as the original
single-module ``moonshot_spark.queries``: ``QUERIES``, ``ORACLES``,
``register``, ``ensure_session_confs``).  Domain modules register on
import; ``_base`` holds the registry and shared fragments."""

from moonshot_spark.queries._base import (  # noqa: F401
    ORACLES, QUERIES, QueryFn, ensure_session_confs, register,
)

{mod_imports}
''')
    os.remove(SRC)
    print("wrote", PKG)
    for d in MODULE_ORDER + ["_base"]:
        n = len(chunks[d])
        print(f"  {d}: {n} top-level nodes")
    print("cross-module imports:", {d: {m: sorted(v) for m, v in n.items()}
                                    for d, n in needs.items() if n})


if __name__ == "__main__":
    main()
