"""Random-forest ensemble replay as pure Catalyst expressions.

The reference's classify leg loads a previously-trained RF model and
maps it over pixel rows (/root/reference/ccdc/randomforest.py:90-103);
training happens in a separate job (randomforest.py:36-63, covered
here by plans/classification.py + tools/train_ml1_model.py). This
module replays a checked-in fitted ensemble — exported tree-by-tree
from a seeded MLlib fit — as nested CASE expressions, so inference is

* **zero-UDF / whole-stage-codegen**: each tree is a depth-<=5 CASE
  over `element_at(embedding, i)` comparisons; no Python worker, no
  model broadcast, no MLlib runtime on the scoring path. At 100 TB
  this is a map-only scan — the ensemble is ~500 literal nodes baked
  into the plan, scoring cost is O(trees * depth) comparisons/row.
* **oracle-certifiable**: the REGISTRY slot's prediction is integer
  hard-voting (each tree votes its leaf class; majority wins,
  smallest class index breaks ties), a deterministic integer
  function of (artifact, row) that a generated DuckDB twin replays
  exactly — no float-sum tie-break ambiguity.
* **both inference semantics are certified** (r8): MLlib's actual
  `transform` rule — predictRaw sums per-tree leaf class *fractions*
  (RandomForestClassificationModel.predictRaw), argmax with
  first-max tie-break — is replayed by :func:`classify_soft` over
  quantized integer leaf distributions (round(fraction·1e6), baked
  at EXPORT time so no float math exists in any replay plan), and
  tests/test_rf_replay.py proves it equals `model.transform`'s
  predictions row-for-row on the sf0.01 embeddings. The registry
  keeps hard-vote (the exactness-safe choice for the DuckDB oracle);
  on tie-adjacent rows the two rules can differ by design.

Split rule matches MLlib's ContinuousSplit: feature <= threshold
goes left. Feature i reads `embedding[i+1]` (1-based element_at),
cast to double on both sides (parquet float32 -> double is exact).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models",
    "ml1_rf.json",
)


@lru_cache(maxsize=1)
def load_model() -> dict:
    """Load the checked-in ensemble artifact (see tools/train_ml1_model.py)."""
    with open(_MODEL_PATH) as f:
        return json.load(f)


# ------------------------------------------------- shared tree generator


def _split_cond(node: dict, probe_fmt, d_fmt) -> str:
    """Go-left condition for one internal node. ContinuousSplit:
    value <= threshold. CategoricalSplit (`cats` — produced when the
    pipeline's VectorIndexer declared the feature categorical, r9):
    value IN leftCategories, rendered as OR'd exact equalities on the
    indexed doubles. A NULL probe (a category the fitted VectorIndexer
    never saw — MLlib's transform would raise) makes the condition
    NULL, which CASE routes to the ELSE/right child."""
    p = probe_fmt(node["feat"])
    if "cats" in node:
        if not node["cats"]:
            return "FALSE"
        return "(" + " OR ".join(f"{p} = {d_fmt(c)}" for c in node["cats"]) + ")"
    return f"{p} <= {d_fmt(node['thr'])}"


def _tree_case(node: dict, probe_fmt, d_fmt) -> str:
    """Recursive CASE text for one tree; `probe_fmt(feat)` renders the
    feature access, `d_fmt(x)` an exact double literal — the only two
    dialect differences between Spark SQL and DuckDB."""
    if "pred" in node:
        return str(node["pred"])
    return (
        f"CASE WHEN {_split_cond(node, probe_fmt, d_fmt)}"
        f" THEN {_tree_case(node['left'], probe_fmt, d_fmt)}"
        f" ELSE {_tree_case(node['right'], probe_fmt, d_fmt)} END"
    )


def _probe_fmt_for(model: dict, raw_fmt):
    """Feature-probe renderer honoring the exported VectorIndexer
    category maps (r9): MLlib's trees split on the INDEXED feature
    space, so a categorical feature's raw value must pass through the
    same value -> category-index mapping before any comparison.
    Continuous features probe raw. Unseen categorical values render
    NULL (no ELSE) — see `_split_cond` for the routing rule."""
    cmaps = {int(f): m for f, m in (model.get("category_maps") or [])}

    def fmt(feat: int) -> str:
        raw = raw_fmt(feat)
        m = cmaps.get(feat)
        if not m:
            return raw
        whens = " ".join(
            f"WHEN {raw} = {_d(float(v))} THEN {_d(float(i))}" for v, i in m
        )
        return f"CASE {whens} END"

    return fmt


def _d(x: float) -> str:
    """Exact double literal for BOTH engines: bare decimals parse as
    DECIMAL in Spark SQL and DuckDB alike (CLAUDE.md trap) — ride
    repr() through CAST(VARCHAR AS DOUBLE), which is correctly-rounded
    strtod on each side."""
    return f"CAST('{x!r}' AS DOUBLE)"


# ---------------------------------------------------------------- Spark side


def _spark_probe(model: dict, emb: str):
    return _probe_fmt_for(
        model, lambda f: f"CAST(element_at({emb}, {f + 1}) AS DOUBLE)"
    )


def _tree_col(node: dict, probe_fmt) -> Column:
    """One tree as a Catalyst expression via a SINGLE F.expr parse —
    building ~500 nodes through the Column API costs thousands of
    py4j round-trips (~5 s of pure driver time, measured), where the
    JVM-side SQL parser takes milliseconds on the same text."""
    return F.expr(_tree_case(node, probe_fmt, _d))


def classify(df: DataFrame, model: dict, emb: str = "embedding") -> DataFrame:
    """Hard-vote RF inference: adds ``predicted_label`` (the original
    label value the winning class index maps back to, via the
    exported StringIndexer labels) and ``votes_top`` (the winning
    vote count), both INT. Pure projection — no shuffle, no UDF.

    Expression-size discipline: the ensemble subtree (~500 CASE
    nodes) must appear exactly ONCE in the plan or codegen blows the
    64 KB JVM method limit — so votes/counts are staged through
    intermediate columns, counts fold over a literal class sequence
    (transform+filter HOFs reference `_votes` a single time), and
    CollapseProject keeps `_cnts` un-inlined because a non-cheap
    producer used 3x is never collapsed."""
    labels = model["labels"]
    probe = _spark_probe(model, emb)
    votes = F.array(*[_tree_col(t, probe) for t in model["trees"]])
    # staging columns carry a collision-proof prefix: classify() is a
    # library transform, so a caller's own _votes/_cnts must survive
    vc, cc = "__rf_votes__", "__rf_cnts__"
    # counts[c] = number of trees voting class c; argmax via
    # array_position (first occurrence -> smallest-index tie-break).
    cnts = F.transform(
        F.sequence(F.lit(0), F.lit(len(labels) - 1)),
        lambda c: F.size(F.filter(F.col(vc), lambda v: v == c)),
    )
    top = F.array_max(cc)
    idx = F.array_position(cc, top)  # 1-based
    label_arr = F.array(*[F.lit(x) for x in labels])
    return (
        df.withColumn(vc, votes)
        .withColumn(cc, cnts)
        .withColumn("predicted_label", F.element_at(label_arr, idx.cast("int")).cast("int"))
        .withColumn("votes_top", top.cast("int"))
        .drop(vc, cc)
    )


# --------------------------------------------------------------- DuckDB twin


def _duck_probe(model: dict, emb: str):
    return _probe_fmt_for(model, lambda f: f"CAST({emb}[{f + 1}] AS DOUBLE)")


def rf_sql_twin(model: dict, table: str = "embeddings", emb: str = "embedding") -> str:
    """DuckDB replay of :func:`classify` over ``table`` — same trees,
    same hard-vote rule, same tie-break (list_position = first max)."""
    labels = model["labels"]
    probe = _duck_probe(model, emb)
    votes = ", ".join(_tree_case(t, probe, _d) for t in model["trees"])
    counts = ", ".join(
        f"CAST(len(list_filter(votes, x -> x = {c})) AS INT)" for c in range(len(labels))
    )
    label_list = ", ".join(str(x) for x in labels)
    return f"""
        WITH v AS (SELECT vec_id, [{votes}] AS votes FROM {table}),
        c AS (SELECT vec_id, [{counts}] AS cnts FROM v)
        SELECT vec_id,
               CAST(([{label_list}])[list_position(cnts, list_max(cnts))] AS INT)
                   AS predicted_label,
               CAST(list_max(cnts) AS INT) AS votes_top
        FROM c
    """


# ------------------------------------------------- soft-vote (MLlib rule)

SOFT_SCALE = 1_000_000


def _tree_dist_case(node: dict, probe_fmt, d_fmt) -> str:
    """Recursive CASE text yielding the leaf's QUANTIZED class
    distribution as an integer array literal."""
    if "pred" in node:
        q = node.get("q")
        if q is None:
            raise ValueError(
                "artifact leaf lacks 'q' (quantized class distribution); "
                "regenerate with tools/train_ml1_model.py"
            )
        return "array(" + ",".join(f"{int(v)}L" for v in q) + ")"
    return (
        f"CASE WHEN {_split_cond(node, probe_fmt, d_fmt)}"
        f" THEN {_tree_dist_case(node['left'], probe_fmt, d_fmt)}"
        f" ELSE {_tree_dist_case(node['right'], probe_fmt, d_fmt)} END"
    )


def classify_soft(
    df: DataFrame,
    model: dict,
    emb: str = "embedding",
    raw_col: str | None = None,
) -> DataFrame:
    """MLlib-semantics RF inference: per tree, the matched leaf
    contributes its class-count *fractions* (quantized to integers at
    export — round(count_c/total·1e6)); fractions are SUMMED across
    trees and the argmax (first max == smallest class index, exactly
    `Vector.argmax`'s tie rule) maps back through the exported
    StringIndexer labels. This is RandomForestClassificationModel
    .predictRaw + probability2prediction with integer-exact
    arithmetic. The equality with `model.transform` is CERTIFIED ON
    THE TEST CORPUS (row-for-row on the sf0.01 embeddings,
    tests/test_rf_replay.py) — it is not a universal guarantee:
    fractions are quantized to round(f*1e6), so on an unseen row
    whose float fraction-sums differ by less than ~1e-6 the
    quantized argmax can break the near-tie differently than MLlib's
    float argmax (r8 ADVICE).

    Same plan discipline as :func:`classify`: the ensemble subtree
    appears ONCE (staged column), the fold is a zip_with aggregate
    over it — map-only, zero-UDF, shuffle-free.
    """
    labels = model["labels"]
    k = len(labels)
    probe = _spark_probe(model, emb)
    dists = F.array(
        *[F.expr(_tree_dist_case(t, probe, _d)) for t in model["trees"]]
    )
    dc, sc = "__rf_dists__", "__rf_sum__"
    zero = F.expr(f"array_repeat(CAST(0 AS BIGINT), {k})")
    summed = F.aggregate(
        F.col(dc), zero, lambda a, x: F.zip_with(a, x, lambda p, q: p + q)
    )
    top = F.array_max(F.col(sc))
    idx = F.array_position(F.col(sc), top)  # 1-based, first max
    label_arr = F.array(*[F.lit(x) for x in labels])
    out = (
        df.withColumn(dc, dists)
        .withColumn(sc, summed)
        .withColumn(
            "predicted_label",
            F.element_at(label_arr, idx.cast("int")).cast("int"),
        )
        .withColumn("score_top", top.cast("long"))
    )
    if raw_col is not None:
        # MLlib's rawPrediction (predictRaw = the per-class sum of
        # per-tree leaf fractions) reconstructed from the quantized
        # integer sums — exact to the 1e-6/tree quantization (r9,
        # serves the classification plan's replay leg as `rfrawp`);
        # zero-padded to MLlib's raw width (the truncated
        # handleInvalid='keep' slot carries no mass by construction)
        raw = F.transform(
            F.col(sc),
            lambda v: v.cast("double") / F.lit(float(SOFT_SCALE)),
        )
        pad = int(model.get("n_raw", k)) - k
        if pad > 0:
            raw = F.concat(
                raw, F.expr(f"array_repeat(CAST(0 AS DOUBLE), {pad})")
            )
        out = out.withColumn(raw_col, raw)
    return out.drop(dc, sc)


def predict_row_soft(model: dict, embedding: list[float]) -> tuple[int, int]:
    """Pure-Python replica of the quantized soft-vote rule."""
    labels = model["labels"]
    k = len(labels)
    acc = [0] * k
    for tree in model["trees"]:
        for c, v in enumerate(_descend(model, tree, embedding)["q"]):
            acc[c] += int(v)
    top = max(acc)
    return labels[acc.index(top)], top


def export_ensemble(si_model, rf_model) -> dict:
    """Export a fitted StringIndexer + RandomForestClassificationModel
    into the artifact shape BOTH replay rules run on (single source of
    truth for the leaf quantization — tools/train_ml1_model.py and the
    certification test call this same function).

    Leaf `q` is MLlib's per-leaf impurityStats (class counts)
    normalized to fractions and quantized: round(count_c/total·1e6).
    MLlib numClasses can exceed len(labels) (StringIndexer
    handleInvalid='keep' reserves an unseen slot never populated in
    training) — trailing all-zero stats are truncated, anything else
    raises.
    """
    labels = [int(x) for x in si_model.labels]
    k = len(labels)

    def walk(jnode) -> dict:
        if jnode.getClass().getName().endswith("InternalNode"):
            split = jnode.split()
            base = {
                "left": walk(jnode.leftChild()),
                "right": walk(jnode.rightChild()),
            }
            if split.getClass().getName().endswith("CategoricalSplit"):
                # categorical feature (VectorIndexer-declared):
                # row goes LEFT iff the indexed value is in
                # leftCategories (MLlib's CategoricalSplit rule, r9)
                return {
                    "feat": split.featureIndex(),
                    "cats": [float(c) for c in list(split.leftCategories())],
                } | base
            return {
                "feat": split.featureIndex(),
                "thr": split.threshold(),
            } | base
        stats = list(jnode.impurityStats().stats())
        if len(stats) > k:
            extra = stats[k:]
            if any(v != 0.0 for v in extra):
                raise ValueError(
                    f"leaf carries mass in class indices >= {k}: {stats}"
                )
            stats = stats[:k]
        total = sum(stats)
        if total <= 0:
            raise ValueError(f"leaf with non-positive total count: {stats}")
        return {
            "pred": int(jnode.prediction()),
            "q": [int(round(v / total * SOFT_SCALE)) for v in stats],
        }

    return {
        "n_features": rf_model.numFeatures,
        "labels": labels,
        # MLlib's raw-vector width (can exceed len(labels): the
        # StringIndexer handleInvalid='keep' slot) — the replay pads
        # its reconstructed rawPrediction with zeros to this width so
        # serving output is shape-identical to transform's (r9)
        "n_raw": int(rf_model.numClasses),
        "trees": [walk(t._call_java("rootNode")) for t in rf_model.trees],
    }


def export_pipeline(pipeline_model) -> dict:
    """Export plans/classification's fitted 3-stage PipelineModel
    (StringIndexer -> VectorIndexer -> RandomForestClassifier,
    mirroring /root/reference/ccdc/randomforest.py:25-39) into the
    replay artifact: `export_ensemble`'s trees + labels PLUS the
    VectorIndexer's category maps (`category_maps`:
    [[feat, [[raw_value, category_index], ...]], ...]) — MLlib's
    trees split on the INDEXED feature space, so the replay probe
    must apply the same raw-value -> index mapping (r9; the serving
    path the reference's classify job needs, randomforest.py:90-103)."""
    si = vi = rf = None
    for st in pipeline_model.stages:
        name = type(st).__name__
        if name == "StringIndexerModel":
            si = st
        elif name == "VectorIndexerModel":
            vi = st
        elif name == "RandomForestClassificationModel":
            rf = st
    if si is None or rf is None:
        raise ValueError(
            "pipeline must contain StringIndexerModel and "
            f"RandomForestClassificationModel stages; got "
            f"{[type(s).__name__ for s in pipeline_model.stages]}"
        )
    art = export_ensemble(si, rf)
    if vi is not None and vi.categoryMaps:
        art["category_maps"] = [
            [int(f), sorted([float(v), int(i)] for v, i in m.items())]
            for f, m in sorted(vi.categoryMaps.items())
        ]
    return art


# ------------------------------------------------------------ pure replica


def _descend(model: dict, tree: dict, embedding) -> dict:
    """Walk one tree to its leaf, honoring category maps and
    categorical splits exactly like the SQL renderers: an unmapped
    categorical value probes NULL -> every condition false -> right."""
    cmaps = {
        int(f): {float(v): float(i) for v, i in m}
        for f, m in (model.get("category_maps") or [])
    }
    node = tree
    while "pred" not in node:
        x = float(embedding[node["feat"]])
        if node["feat"] in cmaps:
            x = cmaps[node["feat"]].get(x)  # None = unseen category
        if "cats" in node:
            left = x is not None and x in set(node["cats"])
        else:
            left = x is not None and x <= node["thr"]
        node = node["left"] if left else node["right"]
    return node


def predict_row(model: dict, embedding: list[float]) -> tuple[int, int]:
    """Pure-Python replica of the hard-vote rule for parity tests."""
    labels = model["labels"]
    counts = [0] * len(labels)
    for tree in model["trees"]:
        counts[_descend(model, tree, embedding)["pred"]] += 1
    top = max(counts)
    return labels[counts.index(top)], top
