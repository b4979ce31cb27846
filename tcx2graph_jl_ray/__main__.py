"""Command-line surface: `python -m tcx2graph_jl_ray <cmd> ...`.

The CLI is one of the three places allowed to OWN a Ray session (with
bench.py and the test fixture — the library itself never calls ray.init;
the grading driver initializes Ray before importing `__ray_entry__`).

Commands:
  kg      --sf DIR --out DIR [--parts N] [--mult M]   flagship KG build
  corpus  --sf DIR --out DIR [--parts N]              curation pipeline
  analytics --sf DIR --out DIR [--parts N]            events analytics mart
  audit   --sf DIR --out DIR [--max-dup-share X]      data-quality audit
  retrieval --sf DIR --out DIR [--parts N] [--cells C] hybrid index build
  search  --index DIR [--terms t1,t2] [--k K]         BM25 over the index
  query   NAME --sf DIR [--out PARQUET_DIR]           any registry query
  list                                                registry query names
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(**kwargs)
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tcx2graph_jl_ray")
    ap.add_argument("--cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_kg = sub.add_parser("kg", help="run the flagship KG pipeline")
    p_kg.add_argument("--sf", required=True)
    p_kg.add_argument("--out", required=True)
    p_kg.add_argument("--parts", type=int, default=32)
    p_kg.add_argument("--mult", type=int, default=1)

    p_co = sub.add_parser("corpus", help="run the corpus curation pipeline")
    p_co.add_argument("--sf", required=True)
    p_co.add_argument("--out", required=True)
    p_co.add_argument("--parts", type=int, default=32)

    p_an = sub.add_parser(
        "analytics", help="run the events analytics-mart pipeline"
    )
    p_an.add_argument("--sf", required=True)
    p_an.add_argument("--out", required=True)
    p_an.add_argument("--parts", type=int, default=16)

    p_au = sub.add_parser(
        "audit", help="run the data-quality audit pipeline"
    )
    p_au.add_argument("--sf", required=True)
    p_au.add_argument("--out", required=True)
    p_au.add_argument("--max-dup-share", type=float, default=0.5)

    p_rt = sub.add_parser(
        "retrieval", help="build the hybrid retrieval index"
    )
    p_rt.add_argument("--sf", required=True)
    p_rt.add_argument("--out", required=True)
    p_rt.add_argument("--parts", type=int, default=16)
    p_rt.add_argument("--cells", type=int, default=16)

    p_se = sub.add_parser("search", help="BM25 search over a built index")
    p_se.add_argument("--index", required=True)
    p_se.add_argument("--terms", required=True,
                      help="comma-separated query terms")
    p_se.add_argument("--k", type=int, default=10)

    p_q = sub.add_parser("query", help="run one registry query")
    p_q.add_argument("name")
    p_q.add_argument("--sf", required=True)
    p_q.add_argument("--out", default=None,
                     help="write result parquet here instead of printing")

    sub.add_parser("list", help="list registry query names")

    args = ap.parse_args(argv)

    if args.cmd == "list":
        # registry import is Ray-free
        import __ray_entry__ as entry

        for name in entry.queries():
            print(name)
        return 0

    ray = _ray_session(args.cpus)
    try:
        if args.cmd == "kg":
            from tcx2graph_jl_ray.pipelines.kg import run_kg_pipeline_from_sf

            summary = run_kg_pipeline_from_sf(
                args.sf, args.out, n_parts=args.parts, mult=args.mult
            )
            print(json.dumps(summary, default=str))
        elif args.cmd == "corpus":
            import ray.data as rd

            from tcx2graph_jl_ray.pipelines.corpus import run_corpus_pipeline

            docs = rd.read_parquet(f"{args.sf}/documents.parquet")
            summary = run_corpus_pipeline(docs, args.out, n_parts=args.parts)
            print(json.dumps(summary, default=str))
        elif args.cmd == "analytics":
            from tcx2graph_jl_ray.pipelines.analytics import (
                run_analytics_pipeline,
            )

            summary = run_analytics_pipeline(
                args.sf, args.out, n_parts=args.parts
            )
            print(json.dumps(summary, default=str))
        elif args.cmd == "audit":
            from tcx2graph_jl_ray.pipelines.audit import run_audit_pipeline

            summary = run_audit_pipeline(
                args.sf, args.out, max_dup_share=args.max_dup_share
            )
            print(json.dumps(summary, default=str))
        elif args.cmd == "retrieval":
            from tcx2graph_jl_ray.pipelines.retrieval import (
                run_retrieval_pipeline,
            )

            summary = run_retrieval_pipeline(
                args.sf, args.out, n_parts=args.parts, n_cells=args.cells
            )
            print(json.dumps(summary, default=str))
        elif args.cmd == "search":
            from tcx2graph_jl_ray.pipelines.retrieval import bm25_search

            res = bm25_search(
                args.index, tuple(args.terms.split(",")), k=args.k
            )
            print(res.to_string(index=False))
        elif args.cmd == "query":
            import pandas as pd

            import __ray_entry__ as entry

            q = entry.queries()
            if args.name not in q:
                print(f"unknown query {args.name!r} — see `list`",
                      file=sys.stderr)
                return 2
            res = q[args.name](args.sf)
            if args.out:
                if isinstance(res, pd.DataFrame):
                    import ray.data as rd

                    res = rd.from_pandas(res)
                res.write_parquet(args.out)
                print(f"wrote {args.out}")
            else:
                df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
                print(df.to_string(max_rows=50))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `... | head` closed the pipe: not an error
        raise SystemExit(0)
