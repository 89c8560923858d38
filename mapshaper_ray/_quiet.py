"""Silence three benign-but-noisy Ray Data warnings that fire on every
multi-stage run, so real warnings stay visible.

Root cause (investigated, not assumed): Ray's sort exchange — the
substrate of ``groupby().map_groups()`` — materializes EMPTY range
partitions as zero-row blocks with NO schema
(``PandasBlockSchema(names=[], types=[])``).  Downstream ``map_batches``
operators pass such blocks through WITHOUT invoking the UDF (verified
against ray 2.49: ``Dataset.sort`` on 1 distinct key x 4 blocks yields
three ``names=[]`` blocks and the probe UDF never sees them), so

1. "Operator produced a RefBundle with a different schema" fires once
   per downstream operator per run — our UDFs all return TYPED empty
   frames, but these blocks are born schema-less inside Ray's shuffle
   and no user code can type them;
2. "Error calculating size for column ...: cannot call `vectorize` on
   size 0 inputs unless `otypes` is set" fires in Ray's pandas block
   size estimator on zero-row object columns (typing the empty frame
   does not help: ``np.vectorize`` over a 0-size object column raises
   regardless of the frame's dtypes);
3. "Failed to hash the schemas (for deduplication): unhashable type:
   'dict'" fires in Ray's schema-dedup fast path; hashing failure only
   skips a dedup shortcut.

All three are cosmetic: no data path changes, results are
pytest/oracle-exact either way.  The dtype-drift bug class the
warnings superficially resemble (empty partition changing a column's
dtype — hit twice in asof_join / triangle re_int) is guarded where it
belongs, by typed empty returns in every grouped UDF plus
partition-invariance property tests, NOT by this filter.

The filter matches exact message prefixes on the three emitting
loggers only; anything else — including other warnings from the same
loggers — still prints.  Importing ``mapshaper_ray`` installs it, so
driver and every Ray worker that deserializes our UDFs are covered.
"""

from __future__ import annotations

import logging

_PREFIXES = (
    "Operator produced a RefBundle with a different schema",
    "Error calculating size for column",
    "Failed to hash the schemas (for deduplication)",
)

_LOGGERS = (
    "ray.data._internal.execution.streaming_executor_state",
    "ray.data._internal.pandas_block",
    "ray.data._internal.arrow_ops.transform_pyarrow",
)


class _BenignRayDataNoise(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:
            return True
        return not msg.startswith(_PREFIXES)


def install() -> None:
    f = _BenignRayDataNoise()
    for name in _LOGGERS:
        lg = logging.getLogger(name)
        if not any(isinstance(x, _BenignRayDataNoise) for x in lg.filters):
            lg.addFilter(f)


install()
