"""Arrow block hygiene for native join/shuffle stages.

Ray's sort-based groupby can emit EMPTY blocks whose schema degrades to no
columns at all (a 0-row pandas frame with object columns infers Arrow ``null``
or loses fields entirely). Downstream operators that resolve fields by name —
the native hash ``Dataset.join`` in particular — then fail with
"No match ... for key field reference". ``with_schema`` pins every block of a
Dataset to one explicit Arrow schema: empty blocks are replaced by a typed
empty table, non-empty blocks are column-projected and cast. Zero-copy for
blocks already matching the schema.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import ray.data


def with_schema(
    ds: ray.data.Dataset, fields: Sequence[tuple[str, pa.DataType]]
) -> ray.data.Dataset:
    schema = pa.schema(list(fields))

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        if t.schema == schema:
            return t
        arrays = []
        for name, typ in zip(schema.names, schema.types):
            col = t.column(name)
            arrays.append(col.cast(typ) if col.type != typ else col)
        return pa.Table.from_arrays(arrays, schema=schema)

    return ds.map_batches(norm, batch_format="pyarrow")
