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

from .helpers import skip_unless_slow

skip_unless_slow("combined-feature fuzz mix (~260 s)")


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


def test_strict_original_conform(spark, tmp_path):
    """r8 ADVICE: merge/apply_changes confine the silent null-fill to
    EVOLUTION-ADDED columns. A source omitting a create-time column
    raises (the fill would NULL-overwrite existing values on update);
    the evolution-added fill keeps working; tracking is by PHYSICAL
    identity so a rename follows the column and a drop+re-add counts
    as evolution-added."""
    root = str(tmp_path / "strict")
    t = LakeTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, val double"
        ),
        key_cols=["id"],
    )
    # omit ORIGINAL column `val` -> loud, both writers
    with pytest.raises(ValueError, match="original-schema"):
        t.merge(spark.createDataFrame([(1, "a2")], "id long, name string"))
    with pytest.raises(ValueError, match="original-schema"):
        t.apply_changes(
            spark.createDataFrame(
                [(1, "a2", "upsert")], "id long, name string, _op string"
            )
        )
    # evolution-added columns still null-fill silently
    t.add_column("extra", "double")
    t.merge(
        spark.createDataFrame(
            [(1, "a2", 1.5)], "id long, name string, val double"
        )
    )
    assert sorted(tuple(r) for r in t.snapshot().collect()) == [
        (1, "a2", 1.5, None),
        (2, "b", 2.0, None),
    ]
    # rename an original column: the strict check follows the
    # PHYSICAL column, so omitting it under the NEW name still raises
    t.rename_column("val", "score")
    with pytest.raises(ValueError, match="original-schema"):
        t.merge(spark.createDataFrame([(2, "b2")], "id long, name string"))
    # drop + re-add of an original name = a NEW physical column =
    # evolution-added: omission null-fills
    t.drop_column("score")
    t.add_column("score", "double")
    t.merge(spark.createDataFrame([(2, "b2")], "id long, name string"))
    got = sorted(tuple(r) for r in t.snapshot().select("id", "name", "score").collect())
    assert got == [(1, "a2", None), (2, "b2", None)]
    # append keeps the permissive contract (no strict check): a
    # partial append inserts NULLs but overwrites nothing
    t.append(spark.createDataFrame([(9, "i")], "id long, name string"))
    assert t.snapshot().filter("id = 9").count() == 1


def test_apply_changes_op_col_collision_rejected(spark, tmp_path):
    """r8 ADVICE: op_col equal to a table column used to reach
    _conform(keep=) and emit two identically-named columns (every
    later reference died with AMBIGUOUS_REFERENCE) — now rejected up
    front; so is a table whose schema claims the internal '_op'
    label."""
    root = str(tmp_path / "opcol")
    t = LakeTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "up")], "id long, op string"),
        key_cols=["id"],
    )
    with pytest.raises(ValueError, match="op_col"):
        t.apply_changes(
            spark.createDataFrame(
                [(1, "up", "upsert")], "id long, op string, opx string"
            ),
            op_col="op",
        )
    root2 = str(tmp_path / "opcol2")
    t2 = LakeTable.create(
        spark,
        root2,
        spark.createDataFrame([(1, "x")], "id long, _op string"),
        key_cols=["id"],
    )
    with pytest.raises(ValueError, match="_op"):
        t2.apply_changes(
            spark.createDataFrame(
                [(1, "x", "upsert")], "id long, _op string, myop string"
            ),
            op_col="myop",
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
    # r9: the first clone becomes a persistent CDF leg mutated every
    # step alongside the source (schema/cols frozen at clone time —
    # data ops only), with independent replay closure on BOTH tables
    # and cross-contamination checks after every mutation
    active_clone: dict | None = None

    def _wschema(with_extra):
        s = f"id long, {cols['name']} string, {cols['val']} double"
        return s + (", extra double" if with_extra else "")

    # 20 steps by default; SPARK_GRAFT_FUZZ_STEPS=n runs longer
    # histories (deep restores, many extra-column generations, long
    # checkpoint replays) without touching the seeded op sequence of
    # the default run's prefix
    n_steps = int(os.environ.get("SPARK_GRAFT_FUZZ_STEPS", "20"))
    last = n_steps - 1
    for step in range(n_steps):
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
                # r12: half the time the constraint text carries SQL
                # comments — the storage boundary must normalize them
                # away (a stored line comment would swallow the
                # composed wrapper's tail), and the rest of the mix
                # (rename crossings, restore rebinds, checkpoints)
                # must behave identically either way
                expr = (
                    "id >= 0 -- engine-side floor\n/* prose */"
                    if rng.random() < 0.5
                    else "id >= 0"
                )
                t.add_constraint("id_pos", expr)
                assert (
                    t._live()[1]["constraints"]["id_pos"] == "id >= 0"
                ), "comment normalization missing at add_constraint"
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
                # r9b: a violating apply_changes UPSERT is rejected
                # atomically too — enforcement lives at _commit over
                # the staged (COW-rewritten) files, so the CDC writer
                # shares the guarantee with append/merge
                try:
                    t.apply_changes(
                        spark.createDataFrame(
                            [(-2, "bad", -2.0, "upsert")],
                            _wschema(False) + ", _op string",
                        )
                    )
                    raise AssertionError(
                        f"step {step}: violating apply_changes landed"
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
            if active_clone is None:
                # r9 (r8 VERDICT #2): the FIRST clone becomes a
                # persistent CDF-ENABLED leg — cdf_enabled inherits
                # from the source (Delta property inheritance), its
                # feed starts at ITS create, and from here on BOTH
                # tables keep mutating with independent per-step
                # replay closure. Certify the initial-population
                # closure (clone v1 adds derive as inserts) up front.
                assert c._cdf_enabled(), "clone did not inherit cdf"
                _closure_check(
                    c, 0, c.latest_version(), use_cdf=True,
                    ctx=f"seed {seed} step {step} (clone v1)",
                )
                active_clone = {
                    "t": c,
                    "model": copy.deepcopy(model),
                    "cols": dict(cols),
                    "extra_gen": extra_gen,
                    "next_id": 50_000,
                    "step_tag": step,
                    # r9b: the clone leg gained its own schema-evolution
                    # ops — clone-side generations draw from a disjoint
                    # range so a clone re-add can never alias a source
                    # generation in the model
                    "gen_counter": 1_000,
                    "ver": c.latest_version(),
                    "history": {
                        c.latest_version(): (
                            copy.deepcopy(model),
                            dict(cols),
                            extra_gen,
                        )
                    },
                }
            else:
                # later clones stay throwaway: mutate once, check
                # independence, move on (pre-r9 behavior)
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

        if active_clone is not None and active_clone["t"].root != t.root:
            ac = active_clone
            c, cm = ac["t"], ac["model"]
            ccols, cgen = ac["cols"], ac["extra_gen"]
            c_has_extra = cgen is not None

            def _crow(k, name, val, ev):
                # clone writers must supply EVERY original clone
                # column explicitly (strict_original: 'extra' live at
                # clone time is part of the clone's create schema)
                return (k, name, val) + ((ev,) if c_has_extra else ())

            def _cschema(tail=""):
                s = (
                    f"id long, {ccols['name']} string,"
                    f" {ccols['val']} double"
                )
                return s + (", extra double" if c_has_extra else "") + tail

            # source ops must never advance the CLONE's log (the
            # mirror of the clone->source independence check below)
            assert c.latest_version() == ac["ver"], (
                f"seed {seed} step {step}: source op ({op}) advanced"
                " the CLONE log"
            )
            cv_before = c.latest_version()
            cop = rng.choice(
                [
                    "append", "merge", "delete", "apply_changes",
                    "compact", "rename", "togglecol", "restore",
                    "constraint", "checkpoint", "ckpt_restore",
                ]
            )
            # clone-side CHECK constraint state is read LIVE (like the
            # source leg) — restore can resurrect or remove it, and
            # the r10 rebind fix may have rewritten its referenced
            # column to the clone's current val name
            ccons_live = c._live()[1].get("constraints") or {}
            if cop == "append":
                k = ac["next_id"]
                ac["next_id"] += 1
                ev = float(step) + 0.75 if c_has_extra else None
                c.append(
                    spark.createDataFrame(
                        [_crow(k, f"ca{k}", float(step), ev)], _cschema()
                    )
                )
                cm[k] = (f"ca{k}", float(step), cgen if cgen is not None else -1, ev)
            elif cop == "merge":
                keys = rng.sample(sorted(cm) or [ac["next_id"]], k=min(2, len(cm)))
                keys.append(ac["next_id"])
                ac["next_id"] += 1
                rows = []
                for k in set(keys):
                    ev = float(step) + 0.125 if c_has_extra else None
                    rows.append(_crow(k, f"cm{step}", float(step), ev))
                    cm[k] = (f"cm{step}", float(step), cgen if cgen is not None else -1, ev)
                c.merge(spark.createDataFrame(rows, _cschema()))
            elif cop == "delete":
                cut = rng.choice([2, 3, 7])
                c.delete(f"id % {cut} = 1")
                for k in [k for k in cm if k % cut == 1]:
                    cm.pop(k)
            elif cop == "apply_changes":
                dels = []
                if cm:
                    victim = rng.choice(sorted(cm))
                    dels = [
                        _crow(victim, None, None, None) + ("delete",)
                    ]
                    cm.pop(victim)
                k = ac["next_id"]
                ac["next_id"] += 1
                ev = 8.5 if c_has_extra else None
                ups = [_crow(k, f"cc{step}", 8.0, ev) + ("upsert",)]
                cm[k] = (f"cc{step}", 8.0, cgen if cgen is not None else -1, ev)
                c.apply_changes(
                    spark.createDataFrame(
                        ups + dels, _cschema(", _op string")
                    )
                )
            elif cop == "compact":
                c.compact(target_rows=1_000)
            elif cop == "rename":
                # r9b: renames on the CLONE — the transferred column
                # mapping must evolve independently of the source's
                # (fresh physical translation on the clone, source
                # logical names untouched), and the declared stats
                # column must follow its clone-side rename.
                # r10 crossing: while the clone's CHECK constraint is
                # live on val, renaming val must be REFUSED (the DDL
                # guard) without consuming a version
                sem = rng.choice(["name", "val"])
                new = f"c{sem}_{step}"
                if sem == "val" and "cval_floor" in ccons_live:
                    try:
                        c.rename_column(ccols[sem], new)
                        raise AssertionError(
                            f"seed {seed} step {step}: rename of the "
                            "clone's constrained column was allowed"
                        )
                    except ValueError:
                        pass
                    assert c.latest_version() == cv_before
                else:
                    c.rename_column(ccols[sem], new)
                    ac["cols"][sem] = new
                assert (c._live()[1].get("stats_cols") or []) == [
                    ac["cols"]["val"]
                ], f"seed {seed} step {step}: clone stats_cols lost rename"
            elif cop == "togglecol":
                # r9b: drop + re-add of `extra` on the CLONE — the
                # re-added column gets a fresh clone-side physical name;
                # source rows written under source generations must
                # never resurrect through it (and vice versa)
                if cgen is not None:
                    c.drop_column("extra")
                    ac["extra_gen"] = None
                else:
                    c.add_column("extra", "double")
                    ac["extra_gen"] = ac["gen_counter"]
                    ac["gen_counter"] += 1
            elif cop == "restore":
                # r9b: restore on the CLONE — rolls clone data back
                # (possibly to v1, whose files live in the SOURCE's
                # data dir by absolute path) while keeping the newer
                # clone schema; the source log must not move
                target = rng.choice(sorted(ac["history"]))
                # r10: restore may resurrect the clone's CHECK
                # constraint from a version where val had a DIFFERENT
                # logical name — the rebind fix must rewrite it to the
                # clone's CURRENT val name (physical identity); the
                # referenced physical column always exists in this mix
                # (val is never dropped), so restore never refuses
                c.restore(target)
                ac["model"] = copy.deepcopy(ac["history"][target][0])
                cm = ac["model"]
                rcons = c._live()[1].get("constraints") or {}
                if "cval_floor" in rcons:
                    assert rcons["cval_floor"] == (
                        f"{ac['cols']['val']} > -1000000000.0"
                    ), (
                        f"seed {seed} step {step}: restored clone "
                        f"constraint not rebound: {rcons['cval_floor']!r}"
                    )
            elif cop == "constraint":
                # r10 (r9 VERDICT #5): CHECK constraint add/drop on
                # the CLONE, interleaved with clone-side evolution —
                # the one uncrossed pair in the r9 mix log. The
                # constraint references the clone's CURRENT val name,
                # a violating append rejects atomically, and the
                # SOURCE's constraint set never gains it.
                from lcmap_firebird_spark.lakehouse import (
                    ConstraintViolation,
                )

                if "cval_floor" not in ccons_live:
                    c.add_constraint(
                        "cval_floor", f"{ccols['val']} > -1000000000.0"
                    )
                    cv0 = c.latest_version()
                    bad_ev = 0.0 if c_has_extra else None
                    try:
                        c.append(
                            spark.createDataFrame(
                                [_crow(ac["next_id"], "cbad", -2e9, bad_ev)],
                                _cschema(),
                            )
                        )
                        raise AssertionError(
                            f"seed {seed} step {step}: violating clone "
                            "append landed"
                        )
                    except ConstraintViolation:
                        pass
                    assert c.latest_version() == cv0
                else:
                    c.drop_constraint("cval_floor")
                scons = t._live()[1].get("constraints") or {}
                assert "cval_floor" not in scons, (
                    f"seed {seed} step {step}: clone constraint leaked "
                    "into the source"
                )
            elif cop == "checkpoint":
                # r10 (round-11 candidate pulled forward): checkpoint
                # the CLONE's log mid-mix — checkpointed replay must
                # carry the clone's own mapping/constraints/identity
                # state, restores to pre-checkpoint versions (clone
                # restore op) fall back to full replay, and the
                # checkpoint file lives in the CLONE's _txn, never the
                # source's. No commit: the log must not advance.
                c.checkpoint_log()
                assert c.latest_version() == cv_before, (
                    f"seed {seed} step {step}: clone checkpoint "
                    "consumed a version"
                )
            elif cop == "ckpt_restore":
                # r11 (r10 VERDICT #5): the DELIBERATE checkpoint_log
                # x restore x clone metadata-only triple — the
                # least-crossed combination in the mix log (the
                # independent checkpoint/restore ops only rarely land
                # in this order by chance). Checkpoint the clone's
                # head, advance the log with a metadata-only commit
                # (bloom_index — zero row change), then restore to a
                # PRE-checkpoint version: _live(target) must ignore
                # the too-new checkpoint (full-replay fallback), the
                # restore's own head replay runs THROUGH the
                # checkpoint, and a fresh checkpoint over the
                # post-restore head must summarize the restored state
                # exactly (asserted by the generic clone==model check
                # below plus the end-of-run time-travel sweep).
                c.checkpoint_log()
                assert c.latest_version() == cv_before, (
                    f"seed {seed} step {step}: triple checkpoint "
                    "consumed a version"
                )
                c.build_bloom_index()  # metadata commit past the ckpt
                target = rng.choice(sorted(ac["history"]))
                c.restore(target)
                ac["model"] = copy.deepcopy(ac["history"][target][0])
                cm = ac["model"]
                # second checkpoint ON TOP of the restore commit: the
                # next clone op (and every later read) replays from it
                c.checkpoint_log()
                # pre-checkpoint versions still time-travel (full-
                # replay fallback past a newer checkpoint), displayed
                # under the names in force at that version
                tv = rng.choice(sorted(ac["history"]))
                m_tv, cols_tv, gen_tv = ac["history"][tv]
                assert _got(
                    c, cols_tv, gen_tv is not None, version=tv
                ) == _display(m_tv, gen_tv), (
                    f"seed {seed} step {step}: pre-checkpoint clone "
                    f"version {tv} lost time travel after the triple"
                )
            # schema ops above may have moved cols/extra_gen — refresh
            # before asserting
            ccols, cgen = ac["cols"], ac["extra_gen"]
            c_has_extra = cgen is not None
            # clone == its own model, identity hygiene holds
            assert _got(c, ccols, c_has_extra) == _display(cm, cgen), (
                f"seed {seed} step {step} (clone {cop}): clone != model"
            )
            crids = _rids(c)
            assert None not in crids and len(set(crids)) == len(crids), (
                f"seed {seed} step {step}: clone identity broke"
            )
            # per-step replay closure on the CLONE's own CDF feed
            cv_after = c.latest_version()
            if cv_after > cv_before and (rng.random() < 0.5 or step == last):
                _closure_check(
                    c, cv_before, cv_after, use_cdf=True,
                    ctx=f"seed {seed} step {step} (clone {cop})",
                )
            # cross-contamination: mutating the clone moved NOTHING
            # on the source (histories are independent logs)
            assert t.latest_version() == v_after, (
                f"step {step}: clone op advanced the SOURCE log"
            )
            assert _got(t, cols, extra_gen is not None) == want, (
                f"seed {seed} step {step}: clone {cop} leaked into source"
            )
            ac["ver"] = cv_after
            ac["history"][cv_after] = (
                copy.deepcopy(cm),
                dict(ccols),
                cgen,
            )
        if v_after > v_before and (rng.random() < 0.4 or step == last):
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

    # the persistent clone's own history time-travels too — checked
    # BEFORE the source vacuum below, which may legally invalidate
    # clone-referenced source files (Delta's documented caveat)
    if active_clone is not None:
        ac = active_clone
        for v, (m, vcols, vgen) in ac["history"].items():
            assert _got(ac["t"], vcols, vgen is not None, version=v) == _display(
                m, vgen
            ), f"seed {seed}: clone version {v} time travel"

    # aggressive vacuum keeps the head equal to the model
    t.vacuum(keep_last=1, retention_seconds=0)
    assert _got(t, cols, extra_gen is not None) == _display(model, extra_gen)
