"""Data-quality AUDIT pipeline: the fifth end-to-end flow next to the KG,
corpus, analytics and retrieval pipelines — every table of the lake in, one
small audit mart out. This is the pre-flight gate a 100 TB ingest runs
BEFORE the expensive pipelines: declared-key uniqueness, referential
integrity, per-type value missingness, per-column null percentages, and
the exact-duplicate document rate, each already proven against its DuckDB
oracle as a standalone query (``rel_pk_audit``, ``rel_fk_audit``,
``events_null_share_by_type``, ``clean_missing_stats``, ``dedup_exact``).

Every audit result is dimension-bounded (tables x relationships x types x
columns — never row-scale), so the mart writes as single parquet files plus
one machine-readable ``audit_summary.json`` with pass/fail gates:

    pk_ok       every declared key unique
    fk_ok       zero orphan child rows
    dup gate    exact-duplicate doc share below ``max_dup_share``

Reference lifecycle analogue: the validate-before-build step of
examples/main.jl (load -> check -> build) made a first-class pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import ray
import ray.data


def _write_small(result, path: str) -> int:
    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    result.to_parquet(path, index=False)
    return len(result)


def run_audit_pipeline(
    sf_dir: str,
    out_dir: str,
    max_dup_share: float = 0.5,
    lineage: dict | None = None,
) -> dict:
    """All-tables audit -> small mart under ``out_dir``. Returns the
    summary dict (also written as audit_summary.json)."""
    from tcx2graph_jl_ray.functions.grouping import bucketed_group_apply
    from tcx2graph_jl_ray.stages.clean import missing_stats
    from tcx2graph_jl_ray.stages.relational import fk_audit, pk_audit
    from tcx2graph_jl_ray.stages.window import null_share_by_type

    lineage = dict(lineage or {})
    fp = hashlib.sha256(
        json.dumps({"lineage": lineage, "sf_dir": sf_dir},
                   sort_keys=True).encode()
    ).hexdigest()[:16]

    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}

    pk = pk_audit(sf_dir).to_pandas()
    rows["pk_audit"] = _write_small(
        pk, os.path.join(out_dir, "pk_audit.parquet"))

    fk = fk_audit(sf_dir).to_pandas()
    rows["fk_audit"] = _write_small(
        fk, os.path.join(out_dir, "fk_audit.parquet"))

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    rows["null_by_type"] = _write_small(
        null_share_by_type(events),
        os.path.join(out_dir, "null_by_type.parquet"),
    )
    rows["missing_stats"] = _write_small(
        missing_stats(
            events,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ),
        os.path.join(out_dir, "missing_stats.parquet"),
    )

    # exact-duplicate rate over documents: md5-keyed per-batch partials ->
    # one bucketed count-of-groups reduce (the dedup_exact shuffle shape,
    # folded to the two scalars the gate needs)
    from tcx2graph_jl_ray.functions.digest import md5_hex

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def digest(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch[batch["text"].notna()]
        s = pd.Series(md5_hex(d["text"]))
        g = s.groupby(s, sort=False).size()
        return pd.DataFrame({
            "h": g.index,
            "n": g.to_numpy().astype("int64"),
        })

    def per_hash(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("h", sort=False)["n"].sum()
        c = g.to_numpy(dtype="int64")
        return pd.DataFrame({
            "n_docs": pd.array([int(c.sum())], dtype="int64"),
            "n_dup_docs": pd.array(
                [int((c - 1).clip(min=0).sum())], dtype="int64"),
        })

    dd = bucketed_group_apply(
        docs.map_batches(digest, batch_format="pandas", batch_size=8192),
        ["h"], per_hash, n_buckets=16,
    ).to_pandas()
    n_docs = int(dd["n_docs"].sum())
    n_dup = int(dd["n_dup_docs"].sum())
    dup_share = float(n_dup / n_docs) if n_docs else 0.0

    summary = {
        "fingerprint": fp,
        "out_dir": out_dir,
        "rows": rows,
        "gates": {
            "pk_ok": bool((pk["dup_rows"] == 0).all()),
            "fk_ok": bool((fk["n_orphans"] == 0).all()),
            "dup_ok": bool(dup_share <= max_dup_share),
        },
        "doc_dup": {
            "n_docs": n_docs,
            "n_dup_docs": n_dup,
            "dup_share": round(dup_share, 6),
        },
    }
    with open(os.path.join(out_dir, "audit_summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return summary
