"""Dataset-level validation stage — the engine's core transform.

``validate_dataset(ds, schema)`` maps the compiled schema over a
``ray.data.Dataset`` as ONE streaming ``map_batches`` pass with a stateful
actor pool (:class:`SchemaValidator`): the compiled AST + table plan are
built once per actor in ``__init__`` (the analogue of Xema's compile-once,
reference behaviour.ex:58-75), each batch is validated with zero-copy Arrow
kernels, and the output batch carries

* every input column,
* ``valid`` (bool) — the per-row verdict (``Xema.valid?/2`` lifted to rows),
* ``_viol`` (list<struct<path,keyword,message>>) — per-row violation details
  (empty list for valid rows, so the column is cheap at low violation rates).

Violations as their own Dataset are derived by a second vectorized
``map_batches`` that explodes ``_viol`` on the (rare) invalid rows —
no second validation pass, no driver materialization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xema_ray.functions.kernels import (
    TableCheck,
    compile_table_plan,
    evaluate_batch,
)
from xema_ray.schema.ast import CompiledSchema

VIOL_TYPE = pa.list_(
    pa.struct([("path", pa.string()), ("keyword", pa.string()), ("message", pa.string())])
)


class SchemaValidator:
    """Actor-pool callable for ``map_batches``.

    Holds the compiled schema; compiles the vectorized table plan lazily on
    the first batch (the Arrow schema is only known then) and reuses it for
    every subsequent batch — regexes, enum value-sets and type decisions are
    all resolved once per actor.
    """

    def __init__(self, compiled: CompiledSchema, fail: str = "all",
                 table_checks: Optional[list] = None, keep_details: bool = True):
        self.compiled = compiled
        self.fail = fail
        self.table_checks = table_checks or []
        self.keep_details = keep_details
        self._plan = None
        self._plan_schema = None

    def _plan_for(self, tbl: pa.Table):
        # key on the FULL schema (names + types): shards may disagree on a
        # column's type and a stale plan would misvalidate (review r2)
        if self._plan is None or self._plan_schema != tbl.schema:
            self._plan = compile_table_plan(
                self.compiled, tbl.schema, table_checks=self.table_checks
            )
            self._plan_schema = tbl.schema
        return self._plan

    def __call__(self, tbl: pa.Table) -> pa.Table:
        plan = self._plan_for(tbl)
        valid, violations = evaluate_batch(plan, tbl, fail=self.fail)
        out = tbl.append_column("valid", pa.array(valid, type=pa.bool_()))
        if self.keep_details:
            out = out.append_column("_viol", _violations_list_column(violations, tbl.num_rows))
        return out


def _violations_list_column(violations: list, num_rows: int) -> pa.Array:
    """Columnar assembly of the per-row violation-detail list column."""
    total = sum(len(cv.row_idx) for cv in violations)
    if total == 0:
        offsets = np.zeros(num_rows + 1, dtype=np.int32)
        values = pa.array([], type=VIOL_TYPE.value_type)
        return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
    rows = np.concatenate([cv.row_idx for cv in violations])
    paths = np.concatenate([
        cv.paths if isinstance(cv.paths, np.ndarray) else np.full(len(cv.row_idx), cv.paths, dtype=object)
        for cv in violations
    ])
    kws = np.concatenate([np.full(len(cv.row_idx), cv.keyword, dtype=object) for cv in violations])
    msgs = np.concatenate([np.full(len(cv.row_idx), cv.message, dtype=object) for cv in violations])
    order = np.argsort(rows, kind="stable")
    rows, paths, kws, msgs = rows[order], paths[order], kws[order], msgs[order]
    counts = np.bincount(rows, minlength=num_rows)
    offsets = np.zeros(num_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    values = pa.StructArray.from_arrays(
        [pa.array(paths, type=pa.string()), pa.array(kws, type=pa.string()),
         pa.array(msgs, type=pa.string())],
        names=["path", "keyword", "message"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def explode_violations(id_col: Optional[str] = None, extra_cols: tuple = ()):
    """Vectorized batch fn turning annotated rows into violation rows
    ``(doc_id?, path, keyword, message)`` — applied after a cheap
    ``valid == False`` filter so valid rows never reach it."""

    def fn(tbl: pa.Table) -> pa.Table:
        viol = tbl["_viol"]
        if isinstance(viol, pa.ChunkedArray):
            viol = viol.combine_chunks()
        lengths = pc.list_value_length(viol).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
        flat = pc.list_flatten(viol)
        row_idx = np.repeat(np.arange(tbl.num_rows, dtype=np.int64), lengths)
        cols: dict = {}
        if id_col is not None and id_col in tbl.column_names:
            cols["doc_id"] = tbl[id_col].take(pa.array(row_idx))
        cols["path"] = pc.struct_field(flat, "path")
        cols["keyword"] = pc.struct_field(flat, "keyword")
        cols["message"] = pc.struct_field(flat, "message")
        for name in extra_cols:
            if name in tbl.column_names:
                cols[name] = tbl[name].take(pa.array(row_idx))
        return pa.table(cols)

    return fn


@dataclass
class ValidationResult:
    """Handles to the (lazy) outputs of :func:`validate_dataset`."""

    annotated: Any  # Dataset: input columns + valid (+ _viol)
    id_col: Optional[str]
    extra_cols: tuple = ()
    keep_details: bool = True

    def violations(self):
        """Violation rows as a Dataset (streams; only invalid rows shuffle)."""
        if not self.keep_details:
            raise ValueError(
                "violations() needs keep_details=True on validate_dataset "
                "(the _viol detail column was dropped)")
        inv = self.annotated.map_batches(
            lambda t: t.filter(pc.equal(t["valid"], False)),
            batch_format="pyarrow",
        )
        return inv.map_batches(
            explode_violations(self.id_col, self.extra_cols), batch_format="pyarrow"
        )

    def clean(self):
        """Rows that passed, with bookkeeping columns dropped."""
        def keep_valid(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["valid"], True))
            drop = [c for c in ("valid", "_viol") if c in t.column_names]
            return t.drop_columns(drop)
        return self.annotated.map_batches(keep_valid, batch_format="pyarrow")

    def verdict(self) -> dict:
        """Global verdict summary (small aggregate; safe to materialize)."""
        def summarize(t: pa.Table) -> pa.Table:
            n = t.num_rows
            n_valid = pc.sum(pc.cast(t["valid"], pa.int64())).as_py() or 0
            n_viol = 0
            if "_viol" in t.column_names:
                n_viol = pc.sum(pc.list_value_length(t["_viol"])).as_py() or 0
            return pa.table({
                "rows": pa.array([n], type=pa.int64()),
                "valid_rows": pa.array([n_valid], type=pa.int64()),
                "violations": pa.array([n_viol], type=pa.int64()),
            })
        parts = self.annotated.map_batches(summarize, batch_format="pyarrow").take_all()
        rows = sum(p["rows"] for p in parts)
        valid_rows = sum(p["valid_rows"] for p in parts)
        viols = sum(p["violations"] for p in parts)
        return {
            "rows": rows,
            "valid_rows": valid_rows,
            "invalid_rows": rows - valid_rows,
            "violations": viols,
            "pass": rows == valid_rows,
        }


_TASK_VALIDATOR_CACHE: dict = {}


def validate_dataset(
    ds,
    schema: CompiledSchema,
    fail: str = "all",
    id_col: Optional[str] = None,
    table_checks: Optional[list] = None,
    keep_details: bool = True,
    batch_size: Optional[int] = None,
    concurrency: Any = "default",
    num_cpus: float = 1,
    extra_cols: tuple = (),
    executor: str = "actors",
) -> ValidationResult:
    """Validate a Dataset against a compiled schema.

    One streaming ``map_batches`` pass (zero-copy Arrow batches);
    the result's ``violations()`` / ``clean()`` / ``verdict()`` views are
    lazy.  ``table_checks`` takes :class:`TableCheck` cross-column hooks
    (e.g. the flagship ``n_tok == len(tokens)`` invariant).

    ``executor="actors"`` (default) runs the validator as an actor pool
    — compile-once-per-actor, the stateful-stage shape.  ``"tasks"``
    runs it as plain tasks with the constructor kwargs broadcast via
    ``ray.put`` and the built validator cached per WORKER PROCESS
    (keyed on the broadcast ref, so a new schema rebuilds): identical
    amortization, but no actor-pool spin-up — measured 4.3 s → 1.5 s
    for the sf0.1 full-schema pass on this box (r5, VERDICT item 6).
    Worker processes outlive the dataset, which is exactly why the
    cache works; a small per-process bound (not a clear-on-miss) keeps
    interleaved validations from evicting each other.

    ``concurrency="default"`` resolves per executor: ``(1, 8)`` actors,
    no cap for tasks (Ray's scheduler sizes the pool).  An EXPLICIT
    value is honored by both lanes — a tuple caps the tasks lane at its
    max."""
    kwargs: dict = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    if num_cpus is not None:
        kwargs["num_cpus"] = num_cpus
    ctor = {
        "compiled": schema,
        "fail": fail,
        "table_checks": table_checks,
        "keep_details": keep_details,
    }
    if executor == "tasks":
        import ray

        ref = ray.put(ctor)
        key = str(ref)

        def _validate_batch(t):
            v = _TASK_VALIDATOR_CACHE.get(key)
            if v is None:
                import ray as _ray

                # small LRU-ish bound, NOT clear(): two interleaved
                # tasks-executor validations on one worker must not
                # evict each other every batch (r5 review)
                while len(_TASK_VALIDATOR_CACHE) >= 8:
                    _TASK_VALIDATOR_CACHE.pop(
                        next(iter(_TASK_VALIDATOR_CACHE)))
                v = _TASK_VALIDATOR_CACHE[key] = \
                    SchemaValidator(**_ray.get(ref))
            return v(t)

        if concurrency is not None and concurrency != "default":
            # task pools take a single max-concurrency int; honor the
            # caller's cap instead of silently dropping it (r5 review)
            kwargs["concurrency"] = max(concurrency) \
                if isinstance(concurrency, (tuple, list)) else concurrency
        annotated = ds.map_batches(_validate_batch, **kwargs)
    elif executor == "actors":
        if concurrency == "default":
            concurrency = (1, 8)
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
        annotated = ds.map_batches(
            SchemaValidator, fn_constructor_kwargs=ctor, **kwargs)
    else:
        raise ValueError(f"unknown executor {executor!r}")
    return ValidationResult(annotated=annotated, id_col=id_col,
                            extra_cols=extra_cols, keep_details=keep_details)
