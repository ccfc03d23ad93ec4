"""Seeded randomized cross-checks: the Spark operators vs independent
pure-Python reference implementations, over inputs a hand-written
fixture would never cover.  Seeds are FIXED (reproducible failures);
the references are written from the semantics, not from the Spark code.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random

from pyspark.sql import functions as F

from crypto_datalake_spark import txn
from crypto_datalake_spark.ops.ivm import apply_delta, grouped_agg_state
from crypto_datalake_spark.queries.paragraphs import paragraph_dedup_frame

_W = 4


def _ref_paragraph_dedup(docs: dict[int, str], w: int = _W):
    """Reference: global keep-first over non-overlapping w-token spans."""
    spans = []  # (doc_id, span_idx, span) in scan order
    for doc_id in docs:
        toks = docs[doc_id].split(" ")
        for i in range(0, max(1, (len(toks) + w - 1) // w)):
            spans.append((doc_id, i, " ".join(toks[i * w : i * w + w])))
    first: dict[str, tuple] = {}
    for doc_id, i, s in sorted(spans):
        first.setdefault(s, (doc_id, i))
    out = {}
    for doc_id in docs:
        mine = [(i, s) for d, i, s in spans if d == doc_id]
        kept = [(i, s) for i, s in mine if first[s] == (doc_id, i)]
        removed = len(mine) - len(kept)
        kept_text = " ".join(s for _, s in sorted(kept))
        out[doc_id] = (
            len(mine),
            removed,
            hashlib.md5(kept_text.encode()).hexdigest() if kept else None,
        )
    return out


def test_paragraph_dedup_matches_reference_on_random_corpora(spark):
    vocab = ["a", "b", "c", "dog", "value"]
    for seed in (0, 7, 99):
        rng = random.Random(seed)
        docs = {
            i: " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 18))
            )
            for i in range(25)
        }
        want = _ref_paragraph_dedup(docs)
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (
                r["n_spans"],
                r["n_removed_spans"],
                r["kept_text_hash"],
            )
            for r in paragraph_dedup_frame(df, _W).collect()
        }
        assert got == want, f"seed {seed}"


def test_ivm_matches_recompute_under_random_churn(spark, tmp_path):
    """Random upsert/delete churn with NULL measures and group births/
    deaths: delta-applied state must equal a recompute at every tick."""
    _T = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    KW = dict(keys=["sym", "ts"], order_cols=["ts"], partition_cols=["day"])
    KEYS, MEAS = ["sym"], {"v_sum": "v"}

    def mk(rows):
        return spark.createDataFrame(
            rows, "sym string, ts timestamp_ntz, v double, day string"
        )

    rng = random.Random(11)
    syms, days = ["A", "B", "C", None], ["d1", "d2"]
    path = str(tmp_path / "lake")
    txn.atomic_upsert_partitioned(
        spark, mk([("A", _T(0), 1.0, "d1")]), path, **KW
    )
    state = grouped_agg_state(txn.read_table(spark, path), KEYS, MEAS)

    def rows_sorted(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: [(x is None, str(x)) for x in t],
        )

    for tick in range(1, 7):
        op = rng.choice(["upsert", "delete"])
        if op == "upsert":
            batch = [
                (
                    rng.choice(syms),
                    _T(rng.randrange(40)),
                    rng.choice([None, round(rng.uniform(-5, 5), 3)]),
                    rng.choice(days),
                )
                for _ in range(rng.randint(1, 4))
            ]
            # upsert keys must be unique per (sym, ts)
            seen, uniq = set(), []
            for r in batch:
                if (r[0], r[1]) not in seen:
                    seen.add((r[0], r[1]))
                    uniq.append(r)
            txn.atomic_upsert_partitioned(spark, mk(uniq), path, **KW)
        else:
            tbl = txn.read_table(spark, path)
            live = (
                sorted(
                    tbl.collect(),
                    key=lambda r: [(v is None, str(v)) for v in r],
                )
                if tbl is not None
                else []
            )  # collect order is not guaranteed; sort so the rng's
            # victim schedule is identical on every run (seed 11 kills
            # a NULL-sym row at tick 6 — the NULL-key group-death path)
            if not live:
                continue
            victim = rng.choice(live)
            if victim["sym"] is None:
                # merge joins on plain equality (intentionally not
                # null-safe), so a NULL-key victim would be a silent
                # no-op — delete it through purge_rows, which CAN
                # address NULL keys; vacuum off so table_diff(v-1, v)
                # below still resolves the prior manifest
                txn.purge_rows(
                    spark, path,
                    F.col("sym").isNull() & (F.col("ts") == F.lit(victim["ts"])),
                    ["day"], vacuum_history=False,
                )
            else:
                txn.atomic_merge_into(
                    spark,
                    mk([(victim["sym"], victim["ts"], 0.0, victim["day"])]),
                    path,
                    on=["sym", "ts"],
                    partition_cols=["day"],
                    delete_condition=F.lit(True),
                    insert=False,
                )
        v = txn.current_manifest(spark, path)["version"]
        state = apply_delta(
            state, txn.table_diff(spark, path, v - 1, v), KEYS, MEAS
        )
        tbl = txn.read_table(spark, path)
        want_rows = (
            rows_sorted(grouped_agg_state(tbl, KEYS, MEAS))
            if tbl is not None
            else []  # fully-emptied table: every group must have retired
        )
        assert rows_sorted(state) == want_rows, f"tick {tick} ({op})"
