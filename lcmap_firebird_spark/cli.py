"""CLI — thin shell over the library (reference: ccdc/cli.py:25-74,
click-based `ccdc changedetection|classification`; argparse here to
stay dependency-free).

Usage:
  python -m lcmap_firebird_spark.cli changedetection \
      --observations /path/obs.parquet --x -1815585 --y 1064805 \
      --output /path/out
  python -m lcmap_firebird_spark.cli classification \
      --aux /path/aux.parquet --segments /path/out/segment \
      --msday 0 --meday 999999 --model-out /path/model
"""

from __future__ import annotations

import argparse
import json
import sys

from . import grid
from .session import session
from .sources.ids import chip_ids


def _cmd_changedetection(args: argparse.Namespace) -> int:
    from .plans.changedetection import changedetection

    spark = session("firebird-changedetection")
    obs = spark.read.parquet(args.observations)
    ids = None
    if (args.x is None) != (args.y is None):
        # one-of-two is a malformed invocation: silently ignoring it
        # would CCD-segment the ENTIRE table instead of one tile
        print("--x and --y must be given together", file=sys.stderr)
        return 2
    if args.x is not None and args.y is not None:
        t = grid.tile(args.x, args.y)
        xys = t["chips"][: args.number] if args.number else t["chips"]
        ids = chip_ids(spark, xys)
    tables = changedetection(obs, ids, output_base=args.output)
    if not args.output:
        print(json.dumps({"segments": tables["segment"].count()}))
    return 0


def _cmd_classification(args: argparse.Namespace) -> int:
    from .plans.classification import classify, features, train

    spark = session("firebird-classification")
    aux = spark.read.parquet(args.aux)
    segments = spark.read.parquet(args.segments)
    model = train(
        aux, segments, args.msday, args.meday, num_trees=args.trees, seed=args.seed
    )
    if model is None:
        print("No features found to train model", file=sys.stderr)
        return 1
    if args.model_out:
        model.write().overwrite().save(args.model_out)
    if args.predictions_out:
        from pyspark.sql import functions as F

        from .operators.relational import filter_not_in

        # same gates the model was FIT under: the trends filter
        # (shared helper, not an inline re-implementation) AND the
        # msday/meday segment window — out-of-window segments can
        # carry category values VectorIndexer never saw, and its
        # default handleInvalid='error' would throw at write time
        fdf = features(
            filter_not_in(aux, F.element_at("trends", 1), [0, 9]),
            segments.filter(
                (F.col("sday") >= args.msday) & (F.col("eday") <= args.meday)
            ),
        )
        classify(model, fdf).write.mode("overwrite").parquet(args.predictions_out)
    return 0


def _cmd_corpus(args: argparse.Namespace) -> int:
    """Training-corpus preparation: gates → dedup ladder → optional
    decontamination/substring/mixture stages → split → partitioned
    write with manifest (plans/corpus.prepare_corpus + write_corpus)."""
    from .plans.corpus import prepare_corpus, write_corpus

    spark = session("firebird-corpus")
    docs = spark.read.parquet(args.documents)
    kwargs: dict = {}
    if args.benchmark:
        kwargs["benchmark"] = spark.read.parquet(args.benchmark)
    if args.embeddings:
        kwargs["embeddings"] = spark.read.parquet(args.embeddings)
        kwargs["semdedup_eps"] = args.semdedup_eps
    if args.substring_k:
        kwargs["substring_k"] = args.substring_k
    if args.mixture:
        weights = {}
        for kv in args.mixture.split(","):
            if not kv.strip():
                continue  # tolerate a trailing comma
            name_val = kv.split("=", 1)
            if len(name_val) != 2:
                print(
                    f"malformed --mixture entry {kv!r}: expected "
                    "domain=weight[,domain=weight...]",
                    file=sys.stderr,
                )
                return 2
            try:
                weights[name_val[0].strip()] = float(name_val[1])
            except ValueError:
                print(
                    f"malformed --mixture weight in {kv!r}",
                    file=sys.stderr,
                )
                return 2
        kwargs["mixture"] = weights
        kwargs["mixture_tokens"] = args.mixture_tokens
        kwargs["domain_col"] = args.domain_col
    out = prepare_corpus(
        docs,
        languages=tuple(args.languages.split(",")),
        jaccard_threshold=args.jaccard_threshold,
        redact=args.redact,
        **kwargs,
    )
    manifest = write_corpus(out, args.output, domain_col=args.domain_col)
    print(json.dumps(manifest))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lcmap-firebird-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    cd = sub.add_parser("changedetection", help="segment pixel time series")
    cd.add_argument("--observations", required=True)
    cd.add_argument("--x", type=float, default=None)
    cd.add_argument("--y", type=float, default=None)
    cd.add_argument("--number", type=int, default=2500)  # cli.py:29 default
    cd.add_argument("--output", default=None)
    cd.set_defaults(fn=_cmd_changedetection)

    cl = sub.add_parser("classification", help="train/apply random forest")
    cl.add_argument("--aux", required=True)
    cl.add_argument("--segments", required=True)
    cl.add_argument("--msday", type=int, required=True)
    cl.add_argument("--meday", type=int, required=True)
    cl.add_argument("--trees", type=int, default=500)  # randomforest.py:38
    cl.add_argument("--seed", type=int, default=42)
    cl.add_argument("--model-out", default=None)
    cl.add_argument("--predictions-out", default=None)
    cl.set_defaults(fn=_cmd_classification)

    co = sub.add_parser(
        "corpus", help="prepare a deduplicated training corpus"
    )
    co.add_argument("--documents", required=True)
    co.add_argument("--output", required=True)
    co.add_argument("--languages", default="en")
    co.add_argument("--jaccard-threshold", type=float, default=0.5)
    co.add_argument("--benchmark", default=None,
                    help="parquet of eval items to decontaminate against")
    co.add_argument("--embeddings", default=None,
                    help="parquet (vec_id, embedding) for the SemDeDup rung")
    co.add_argument("--semdedup-eps", type=float, default=0.05)
    co.add_argument("--substring-k", type=int, default=None)
    co.add_argument("--mixture", default=None,
                    help="domain weights, e.g. web=0.6,books=0.4")
    co.add_argument("--mixture-tokens", type=int, default=None)
    co.add_argument("--domain-col", default="source")
    co.add_argument("--redact", action="store_true")
    co.set_defaults(fn=_cmd_corpus)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
