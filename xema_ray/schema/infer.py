"""Schema INFERENCE — profile a corpus and propose a Xema-DSL schema.

The reference direction is schema → validation; production pipelines
also need the inverse: given an unlabelled Parquet corpus, derive the
tightest schema the data satisfies (bounds, lengths, enum candidates,
required-ness), review it, then enforce it on future deliveries.  The
reference's meta-schema machinery (`schema_validator.ex`) guarantees the
proposed schema is itself valid; here the proposal is emitted in the
same DSL tuple form `compile_schema` consumes, so inferred schemas flow
straight into the validation engine.

Shape: one streaming ``map_batches`` pass emitting tiny per-(batch,
column, property) partial rows, folded on the driver by aggregation
kind (min / max / sum / capped set-union) — the column-stats partials
pattern (:mod:`xema_ray.stages.stats`), never a shuffle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: distinct-value cap: a string column proposes an ``enum`` only while
#: its observed distinct set stays at or under this
ENUM_LIMIT = 16

_SET_SEP = "\x1f"


def _partial_rows(tbl: pa.Table, columns) -> pa.Table:
    """(col, prop, agg, num, s) partial rows for one batch."""
    cols, props, aggs, nums, strs = [], [], [], [], []

    def add(c, p, a, num=None, s=None):
        cols.append(c); props.append(p); aggs.append(a)
        nums.append(None if num is None else float(num)); strs.append(s)

    for c in columns:
        if c not in tbl.column_names:
            continue
        col = tbl[c]
        t = col.type
        add(c, "count", "sum", num=len(col))
        add(c, "nulls", "sum", num=col.null_count)
        nn = col.drop_null()
        if len(nn) == 0:
            continue
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            is_int = pa.types.is_integer(t)
            add(c, "_ptype", "kind", s="int" if is_int else "float")
            if not is_int:
                # NaN poisons min_max (it is not null); non-finite
                # bounds don't compile to usable keywords either
                nn = nn.filter(pc.is_finite(nn))
                if len(nn) == 0:
                    continue
            mm = pc.min_max(nn).as_py()
            # int bounds ride in the string slot: the float64 num lane
            # silently rounds int64 values above 2^53 (code-review r3)
            add(c, "minimum", "min", num=mm["min"],
                s=str(mm["min"]) if is_int else None)
            add(c, "maximum", "max", num=mm["max"],
                s=str(mm["max"]) if is_int else None)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            ln = pc.utf8_length(nn)
            mm = pc.min_max(ln).as_py()
            add(c, "min_length", "min", num=mm["min"])
            add(c, "max_length", "max", num=mm["max"])
            # capped distinct set for enum candidates: once a batch has
            # seen > ENUM_LIMIT distinct values the overflow marker
            # poisons the union (saturating fold)
            u = pc.unique(nn)
            if len(u) > ENUM_LIMIT:
                add(c, "enum", "set", s=None)  # overflow marker
            else:
                add(c, "enum", "set",
                    s=_SET_SEP.join(sorted(u.to_pylist())))
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            ln = pc.list_value_length(nn)
            mm = pc.min_max(ln).as_py()
            add(c, "min_items", "min", num=mm["min"])
            add(c, "max_items", "max", num=mm["max"])
            flat = nn.combine_chunks().flatten()
            if len(flat) and (pa.types.is_integer(flat.type)
                              or pa.types.is_floating(flat.type)):
                e_int = pa.types.is_integer(flat.type)
                add(c, "_etype", "kind", s="int" if e_int else "float")
                if not e_int:
                    flat = flat.filter(pc.is_finite(flat))
                if len(flat):
                    fm = pc.min_max(flat).as_py()
                    add(c, "elem_minimum", "min", num=fm["min"],
                        s=str(fm["min"]) if e_int else None)
                    add(c, "elem_maximum", "max", num=fm["max"],
                        s=str(fm["max"]) if e_int else None)
    return pa.table({
        "col": pa.array(cols, type=pa.string()),
        "prop": pa.array(props, type=pa.string()),
        "agg": pa.array(aggs, type=pa.string()),
        "num": pa.array(nums, type=pa.float64()),
        "s": pa.array(strs, type=pa.string()),
    })


def profile_dataset(ds, columns: Optional[list] = None) -> dict:
    """``{col: {prop: value}}`` — numeric bounds as int/float, ``enum``
    as a sorted list or None (cardinality above :data:`ENUM_LIMIT`)."""
    if columns is None:
        columns = [f.name for f in ds.schema().base_schema]
    parts = ds.map_batches(
        lambda t: _partial_rows(t, columns), batch_format="pyarrow")

    out: dict = {}
    enum_sets: dict = {}
    enum_overflow: set = set()
    for row in parts.take_all():
        c, p, a = row["col"], row["prop"], row["agg"]
        slot = out.setdefault(c, {})
        if a == "sum":
            slot[p] = int(slot.get(p, 0) + row["num"])
        elif a == "kind":
            slot[p] = row["s"]
        elif a in ("min", "max"):
            # exact int bounds ride the string slot — the float64 num
            # lane rounds int64 above 2^53 (code-review r3)
            v = int(row["s"]) if row["s"] is not None else row["num"]
            if p not in slot:
                slot[p] = v
            else:
                slot[p] = min(slot[p], v) if a == "min" \
                    else max(slot[p], v)
        elif a == "set":
            if row["s"] is None:
                enum_overflow.add(c)
            else:
                cur = enum_sets.setdefault(c, set())
                cur.update(row["s"].split(_SET_SEP))
                if len(cur) > ENUM_LIMIT:
                    enum_overflow.add(c)
    for c, vals in enum_sets.items():
        out.setdefault(c, {})["enum"] = \
            None if c in enum_overflow else sorted(vals)
    for c in enum_overflow:
        out.setdefault(c, {})["enum"] = None
    # structurally-integer props (counts and lengths) back to int; value
    # BOUNDS keep their column kind — a float column whose observed
    # bounds happen to be integral must NOT become type 'integer'
    # (2.5 would then fail the schema inferred from its own data —
    # code-review r3, confirmed repro)
    _COUNT_PROPS = ("count", "nulls", "min_length", "max_length",
                    "min_items", "max_items")
    for c, slot in out.items():
        for p in _COUNT_PROPS:
            v = slot.get(p)
            if isinstance(v, float) and float(v).is_integer():
                slot[p] = int(v)
    return out


def profile_rows(profile: dict) -> pa.Table:
    """Flatten a profile to sorted ``(col, prop, val)`` VARCHAR rows —
    the cross-engine-comparable form (every value rendered exactly:
    ints without a fraction, enums comma-joined sorted)."""
    rows = []
    for c in sorted(profile):
        for p in sorted(profile[c]):
            v = profile[c][p]
            if p.startswith("_"):
                continue  # internal (column-kind markers)
            if p == "enum":
                if v is None:
                    continue  # no enum candidate
                val = ",".join(v)
            elif isinstance(v, (int, np.integer)):
                val = str(int(v))
            else:
                val = repr(float(v))
            rows.append((c, p, val))
    return pa.table({
        "col": pa.array([r[0] for r in rows], type=pa.string()),
        "prop": pa.array([r[1] for r in rows], type=pa.string()),
        "val": pa.array([r[2] for r in rows], type=pa.string()),
    })


def schema_from_profile(profile: dict, dataset_columns=None):
    """Propose a Xema-DSL ``("map", {...})`` schema: per-column keyword
    sets from the observed bounds, ``required`` = columns with zero
    observed nulls.  By construction the emitted schema ACCEPTS every
    row it was inferred from (bounds are closed over the data) — the
    self-consistency property the tests pin."""
    props = {}
    required = []
    for c in sorted(profile):
        slot = profile[c]
        if "minimum" in slot or "maximum" in slot:
            kw = {}
            if "minimum" in slot:
                kw["minimum"] = slot["minimum"]
            if "maximum" in slot:
                kw["maximum"] = slot["maximum"]
            # the column's physical kind decides int-vs-number — NOT
            # whether the observed bounds happen to be integral (a
            # float column [1.0, 2.5, 4.0] must stay 'number';
            # code-review r3, confirmed repro)
            is_int = slot.get("_ptype") == "int"
            props[c] = ("integer" if is_int else "number", kw)
        elif "min_items" in slot or "max_items" in slot:
            kw = {}
            if "min_items" in slot:
                kw["min_items"] = slot["min_items"]
            if "max_items" in slot:
                kw["max_items"] = slot["max_items"]
            if "elem_minimum" in slot or "elem_maximum" in slot:
                ikw = {}
                if "elem_minimum" in slot:
                    ikw["minimum"] = slot["elem_minimum"]
                if "elem_maximum" in slot:
                    ikw["maximum"] = slot["elem_maximum"]
                kw["items"] = ("integer" if slot.get("_etype") == "int"
                               else "number", ikw)
            props[c] = ("list", kw)
        elif "min_length" in slot or "max_length" in slot:
            kw = {}
            if "min_length" in slot:
                kw["min_length"] = slot["min_length"]
            if "max_length" in slot:
                kw["max_length"] = slot["max_length"]
            if slot.get("enum"):
                kw["enum"] = list(slot["enum"])
            props[c] = ("string", kw)
        else:
            continue
        if slot.get("nulls", 1) == 0:
            required.append(c)
    return ("map", {"properties": props, "required": required})


def infer_schema(ds, columns: Optional[list] = None):
    """One-call convenience: profile → DSL proposal (compile with
    :func:`xema_ray.schema.builder.compile_schema`)."""
    return schema_from_profile(profile_dataset(ds, columns))
