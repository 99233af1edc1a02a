"""Driver-canonicalization gate (r11 verdict item 2).

The round driver canonicalizes every result frame with pandas
``sort_values`` over all columns before hashing; that step raises
``TypeError: unhashable type: 'list'`` on any nested cell. r11's
``keyword_tag`` returned the registry's ONLY raw ``array<string>``
output column and was the first red driver row in seven rounds —
while the repo's own pre-ship mirror stayed green because its hash
normalized lists. Two gates close that blind spot:

1. a registry-wide schema assertion: no query key may emit a
   top-level Array/Map/Struct column (serialize with ``array_join``
   or ``to_json`` — the repo convention at operators/aggregates.py);
2. a unit test proving ``scripts.driver_sim.value_hash`` itself now
   raises on a list column, i.e. the mirror fails where the driver
   fails instead of silently passing.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()


@pytest.mark.parametrize("key", sorted(_QUERIES))
def test_no_nested_output_columns(key, spark, sf_dir):
    df = _QUERIES[key](spark, sf_dir)
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{key}: nested output columns {nested} — the driver's pandas "
        "sort_values canon dies on list/dict cells; serialize with "
        "array_join/to_json like the rest of the registry"
    )


def test_driver_sim_hash_rejects_list_columns():
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from driver_sim import value_hash

    ok = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    assert value_hash(ok)  # scalar frames still hash

    bad = pd.DataFrame({"a": [1, 2], "tags": [["x"], ["y", "z"]]})
    with pytest.raises(TypeError):
        value_hash(bad)
