"""Registry-wide output-schema lint: the driver-canonicalizer contract.

The external driver canonicalizes every query's output with
``toPandas()`` + ``sort_values`` across all columns; pandas cannot
factorize/sort ndarray cells, so any Array/Map/Struct column in a
query's OUTPUT crashes the harness before even the rows-only check runs
(``spark_rows: null``). ``agg_approx_percentile`` shipped exactly that
(a raw ``array<double>`` column) and sat latent for five rounds because
nothing linted output schemas — this test makes the failure class
unshippable: every registry key's output must contain only atomic
fields, or be explicitly whitelisted here with a reason.

Complex types remain fine INSIDE a plan (embedding arrays, minhash
signatures, struct intermediates) — the contract binds only the final
projected schema the driver sees.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from adlspark import registry
from tests.conftest import SF_DIR  # honors ADLSPARK_TEST_SF_DIR like every suite

# key -> reason; empty today and should stay that way. A key may be
# whitelisted ONLY if the driver harness itself grows complex-type
# support (it has not), never for convenience.
_COMPLEX_OUTPUT_WHITELIST: dict[str, str] = {}


def _registry_keys():
    return list(registry.all_queries())


@pytest.mark.parametrize("key", _registry_keys())
def test_output_fields_are_atomic(spark, key):
    if key in _COMPLEX_OUTPUT_WHITELIST:
        pytest.skip(f"whitelisted: {_COMPLEX_OUTPUT_WHITELIST[key]}")
    df = registry.all_queries()[key](spark, SF_DIR)
    complex_fields = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_fields, (
        f"{key} output carries complex-typed fields {complex_fields}; the "
        "driver's pandas canonicalizer cannot factorize ndarray cells — "
        "emit scalar columns (element_at / concat_ws, see "
        "adlspark/ops/aggs.py agg_collect_sorted / agg_approx_percentile)"
    )
