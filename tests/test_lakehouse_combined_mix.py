"""Combined lakehouse feature-mix fuzz (r7 VERDICT next-round #5):
column mapping (rename + drop + re-add of the SAME logical name),
identity columns, and shallow clones interleaved with every rewrite
class (append/merge/COW delete/MOR delete/apply_changes/compact/
compact_deletes/cluster/restore) in ONE random mix — feature
interactions are where the r5-r7 bugs clustered (CDF column rebirth,
bloom-vs-mapping, vacuum-vs-clone).

Model notes:
- the extra column is tracked per row as (generation, value): a
  drop + re-add of logical name `extra` creates a new GENERATION
  (fresh physical name), and a row only displays its value when its
  generation matches the live one — the no-resurrection contract.
- restore keeps the NEWER schema (documented in lakehouse.restore)
  but re-references the target version's files, so the model rolls
  data back while the column state stays put.
- identity values are asserted non-NULL and unique at every step
  (their exact values depend on commit internals, deliberately
  unmodeled); clone appends must not disturb the source.

Default run pins two seeds; set SPARK_GRAFT_FUZZ_SEEDS=n to sweep n
random seeds (the r8 closeout ran 12)."""

from __future__ import annotations

import copy
import os
import random
from collections import Counter

import pytest

from lcmap_firebird_spark.lakehouse import LakeTable


def _replay(base: Counter, change_rows) -> Counter:
    out = Counter(base)
    for row, kind in change_rows:
        if kind in ("delete", "update_preimage"):
            out[row] -= 1
            if out[row] <= 0:
                del out[row]
        elif kind in ("insert", "update_postimage"):
            out[row] += 1
        else:
            raise AssertionError(f"unexpected _change_type {kind!r}")
    return out


def _closure_check(t, v_prev, v_cur, use_cdf, ctx):
    """snapshot(v_prev) ⊎ changes(v_prev, v_cur) == snapshot(v_cur)
    as multisets — across renames, add/drop (physical-identity
    relabel), identity values, and every rewrite class. Checked for
    BOTH feeds: table_changes (snapshot diff) and, when the table
    records CDF, read_cdf (per-commit change rows). Rows compare in
    v_cur's logical space, identity column INCLUDED."""
    cols = t.snapshot(version=v_cur).columns
    _, e_prev = t._live(v_prev)
    _, e_cur = t._live(v_cur)
    base = Counter(
        tuple(r)
        for r in t._relabel(t.snapshot(version=v_prev), e_prev, e_cur)
        .select(*cols)
        .collect()
    )
    want = Counter(
        tuple(r) for r in t.snapshot(version=v_cur).select(*cols).collect()
    )
    feeds = [("table_changes", t.table_changes(v_prev, v_cur))]
    if use_cdf:
        feeds.append(("read_cdf", t.read_cdf(v_prev, v_cur)))
    for feed_name, ch in feeds:
        rows = [
            (tuple(r)[:-1], r["_change_type"])
            for r in ch.select(*cols, "_change_type").collect()
        ]
        got = _replay(base, rows)
        assert got == want, (
            f"{ctx}: {feed_name} replay {v_prev}->{v_cur} diverged"
        )


def test_apply_changes_writer_contract(spark, tmp_path):
    """Point regression for the r8 combined-mix finding: apply_changes
    follows the SAME writer contract as append/merge (_conform) —
    a change batch omitting an evolution-added column null-fills it
    (pre-evolution CDC sources stay valid after add_column), and a
    misspelled column raises instead of silently dropping its data
    (the old hand-rolled projection crashed on the former and
    ignored the latter)."""
    root = str(tmp_path / "cdc")
    t = LakeTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"),
        key_cols=["id"],
    )
    t.add_column("extra", "double")
    # pre-evolution CDC shape: no `extra` column
    t.apply_changes(
        spark.createDataFrame(
            [(1, "a2", "upsert"), (2, None, "delete")],
            "id long, name string, _op string",
        )
    )
    rows = sorted(tuple(r) for r in t.snapshot().collect())
    assert rows == [(1, "a2", None)]
    # misspelled column: loud, not silent data loss
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nme"):
        t.apply_changes(
            spark.createDataFrame(
                [(3, "x", "upsert")], "id long, nme string, _op string"
            )
        )
    # merge shares the contract (its hand-rolled projection crashed
    # on the same omission — found by the CDF-crossed mix, r8)
    t.merge(spark.createDataFrame([(1, "a3"), (5, "e")], "id long, name string"))
    rows = sorted(tuple(r) for r in t.snapshot().collect())
    assert rows == [(1, "a3", None), (5, "e", None)]
    # an absent KEY column is refused, never null-filled into a merge
    with _pytest.raises(ValueError, match="key column"):
        t.merge(spark.createDataFrame([("x",)], "name string"))
    with _pytest.raises(ValueError, match="key column"):
        t.apply_changes(
            spark.createDataFrame([("x", "upsert")], "name string, _op string")
        )


def _seeds():
    n = int(os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "0"))
    if n:
        return list(range(8000, 8000 + n))
    return [7, 31]


def _display(model, live_gen):
    """Expected (id, name, val, idb, extra) rows under the live extra
    generation (None = no extra column). `idb` is the GENERATED
    column id % 5 — a pure function of the key, so the model derives
    it instead of tracking it."""
    out = []
    for k, (name, val, gen, ev) in sorted(model.items()):
        if live_gen is None:
            out.append((k, name, val, k % 5))
        else:
            out.append((k, name, val, k % 5, ev if gen == live_gen else None))
    return out


def _got(t, cols, extra_live, version=None):
    sel = ["id", cols["name"], cols["val"], "idb"] + (
        ["extra"] if extra_live else []
    )
    rows = t.snapshot(version=version).select(*sel).collect()
    return sorted(tuple(r) for r in rows)


def _rids(t):
    return [r["rid"] for r in t.snapshot().select("rid").collect()]


@pytest.mark.parametrize("seed", _seeds())
def test_combined_feature_mix(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"mix{seed}")
    # model: id -> (name, val, extra_gen, extra_val)
    model = {i: (f"n{i}", float(i), -1, None) for i in range(30)}
    t = LakeTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in model.items()],
            "id long, name string, val double",
        ),
        key_cols=["id"],
        identity="rid",
        enable_cdf=True,
        # generated over the KEY (never renamed in this mix — DDL
        # guards lock a generated input against rename) + a declared
        # stats column that the rename op moves
        generated={"idb": "id % 5"},
        stats_cols=["val"],
    )
    cols = {"name": "name", "val": "val"}
    extra_gen: int | None = None  # live generation of `extra`, if any
    gen_counter = 0
    next_id = 1000
    # per-version record: (model snapshot, cols, extra_gen)
    history = {t.latest_version(): (copy.deepcopy(model), dict(cols), extra_gen)}
    clone_n = 0

    def _wschema(with_extra):
        s = f"id long, {cols['name']} string, {cols['val']} double"
        return s + (", extra double" if with_extra else "")

    for step in range(20):
        v_before = t.latest_version()
        op = rng.choice(
            [
                "append", "merge", "delete", "delete_mor",
                "apply_changes", "compact", "compact_deletes",
                "cluster", "restore", "rename", "addcol", "dropcol",
                "clone", "checkpoint", "bloom", "safe_vacuum",
                "bad_generated", "constraint",
            ]
        )
        if op == "append":
            with_extra = extra_gen is not None and rng.random() < 0.7
            rows = []
            for _ in range(rng.randint(1, 3)):
                ev = float(step) + 0.25 if with_extra else None
                rows.append(
                    (next_id, f"a{next_id}", float(step))
                    + ((ev,) if with_extra else ())
                )
                model[next_id] = (
                    f"a{next_id}",
                    float(step),
                    extra_gen if extra_gen is not None else -1,
                    ev,
                )
                next_id += 1
            t.append(spark.createDataFrame(rows, _wschema(with_extra)))
        elif op == "merge":
            with_extra = extra_gen is not None and rng.random() < 0.7
            keys = rng.sample(sorted(model) or [next_id], k=min(3, len(model)))
            keys.append(next_id)
            next_id += 1
            rows = []
            for k in set(keys):
                ev = float(step) + 0.5 if with_extra else None
                rows.append(
                    (k, f"m{step}", float(step))
                    + ((ev,) if with_extra else ())
                )
                # merge REPLACES the whole row (absent cols null-fill)
                model[k] = (
                    f"m{step}",
                    float(step),
                    extra_gen if extra_gen is not None else -1,
                    ev,
                )
            t.merge(spark.createDataFrame(rows, _wschema(with_extra)))
        elif op == "delete":
            cut = rng.choice([3, 5, 7])
            t.delete(f"id % {cut} = 0")
            model = {k: v for k, v in model.items() if k % cut != 0}
        elif op == "delete_mor":
            lo = rng.randint(0, 1100)
            t.delete_mor(f"id >= {lo} AND id < {lo + 200}")
            model = {
                k: v for k, v in model.items() if not (lo <= k < lo + 200)
            }
        elif op == "apply_changes":
            dels = []
            if model:
                victim = rng.choice(sorted(model))
                dels = [(victim, None, None, "delete")]
                model.pop(victim)
            ups = [(next_id, f"c{step}", 9.0, "upsert")]
            model[next_id] = (
                f"c{step}",
                9.0,
                extra_gen if extra_gen is not None else -1,
                None,
            )
            next_id += 1
            t.apply_changes(
                spark.createDataFrame(
                    ups + dels, _wschema(False) + ", _op string"
                )
            )
        elif op == "compact":
            t.compact(target_rows=1_000)
        elif op == "compact_deletes":
            t.compact_deletes(min_deleted_fraction=0.3)
        elif op == "cluster":
            t.cluster()
        elif op == "restore":
            target = rng.choice(sorted(history))
            t.restore(target)
            model = copy.deepcopy(history[target][0])
            # schema/mapping stay the NEWER ones (restore contract);
            # cols/extra_gen unchanged
        elif op == "rename":
            sem = rng.choice(["name", "val"])
            new = f"{sem}_{step}"
            t.rename_column(cols[sem], new)
            cols[sem] = new
            # the declared stats column follows its rename
            assert (t._live()[1].get("stats_cols") or []) == [cols["val"]]
        elif op == "addcol":
            if extra_gen is None:
                t.add_column("extra", "double")
                extra_gen = gen_counter
                gen_counter += 1
            else:
                t.drop_column("extra")
                extra_gen = None
        elif op == "dropcol":
            if extra_gen is not None:
                t.drop_column("extra")
                extra_gen = None
            else:
                t.add_column("extra", "double")
                extra_gen = gen_counter
                gen_counter += 1
        elif op == "constraint":
            # CHECK constraint toggling mid-mix (the r5 model test's
            # op, crossed here with mapping/identity/generated/CDF):
            # while present, a violating append is rejected atomically
            from lcmap_firebird_spark.lakehouse import ConstraintViolation

            cons = t._live()[1].get("constraints") or {}
            if "id_pos" not in cons:
                t.add_constraint("id_pos", "id >= 0")
                v0 = t.latest_version()
                try:
                    t.append(
                        spark.createDataFrame(
                            [(-1, "bad", -1.0)], _wschema(False)
                        )
                    )
                    raise AssertionError(
                        f"step {step}: violating append landed"
                    )
                except ConstraintViolation:
                    pass
                assert t.latest_version() == v0
            else:
                t.drop_constraint("id_pos")
        elif op == "bad_generated":
            # a writer-provided generated value that contradicts the
            # expression must be rejected ATOMICALLY at any point in
            # the history: model unchanged, no version consumed
            from lcmap_firebird_spark.lakehouse import ConstraintViolation

            v0 = t.latest_version()
            bad = spark.createDataFrame(
                [(next_id, "bad", 0.0, (next_id % 5) + 1)],
                f"id long, {cols['name']} string, {cols['val']} double,"
                " idb bigint",
            )
            try:
                t.append(bad)
                raise AssertionError(
                    f"step {step}: contradicting generated value landed"
                )
            except ConstraintViolation:
                pass
            assert t.latest_version() == v0
        elif op == "checkpoint":
            # log checkpoint: pure metadata, no row change — crosses
            # checkpointed-log replay with mapping/identity/CDF state
            t.checkpoint_log()
        elif op == "bloom":
            # bloom sidecar build: metadata commit; crosses sidecar
            # liveness with renames/clones/vacuum (r6 guard territory)
            t.build_bloom_index()
        elif op == "safe_vacuum":
            # conservative sweep (huge retention): must delete NOTHING
            # and disturb nothing — runs the liveness logic mid-mix
            removed = t.vacuum(keep_last=1, retention_seconds=1e9)
            assert removed == [], f"step {step}: safe vacuum removed {removed}"
        elif op == "clone":
            dest = str(tmp_path / f"clone{seed}_{clone_n}")
            clone_n += 1
            c = t.clone(dest)
            assert _got(c, cols, extra_gen is not None) == _display(
                model, extra_gen
            ), f"step {step}: clone != model"
            # clone mutates independently; source must not move
            c.append(
                spark.createDataFrame(
                    [(90_000 + step, "cl", -1.0)], _wschema(False)
                )
            )
            crids = [
                r["rid"] for r in c.snapshot().select("rid").collect()
            ]
            assert None not in crids and len(set(crids)) == len(crids)

        got = _got(t, cols, extra_gen is not None)
        want = _display(model, extra_gen)
        assert got == want, f"seed {seed} step {step} ({op}): snapshot != model"
        rids = _rids(t)
        assert None not in rids, f"step {step}: NULL identity value"
        assert len(set(rids)) == len(rids), f"step {step}: identity collision"
        v_after = t.latest_version()
        if v_after > v_before and (rng.random() < 0.4 or step == 19):
            # CDF replay closure across THIS step's commit(s): crosses
            # the recorded change feed with identity values, renames,
            # add/drop generations, and whatever rewrite just ran
            _closure_check(
                t, v_before, v_after, use_cdf=True,
                ctx=f"seed {seed} step {step} ({op})",
            )
        history[v_after] = (
            copy.deepcopy(model),
            dict(cols),
            extra_gen,
        )

    # every recorded version still time-travels to its recorded state,
    # displayed under the column names in force AT that version
    for v, (m, vcols, vgen) in history.items():
        assert _got(t, vcols, vgen is not None, version=v) == _display(
            m, vgen
        ), f"seed {seed}: version {v} time travel"

    # aggressive vacuum keeps the head equal to the model
    t.vacuum(keep_last=1, retention_seconds=0)
    assert _got(t, cols, extra_gen is not None) == _display(model, extra_gen)
