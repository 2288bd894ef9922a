"""Function-pipeline composition — the reference's transform-chain pattern,
Spark-first.

Reference semantics reproduced:
  - dynamic parser resolution from `module.sub::func` strings, constrained
    to an allowed namespace (common/document_parser/process.py:33-71)
  - ordered pipeline of doc->doc transforms with per-stage exception
    isolation (parsers/policy_analytics/parse.py:52-76)
  - reprocess hook applying a named function to stored records
    (common/document_parser/lib/json_reprocess.py:7-22)

Here a "transform" is `DataFrame -> DataFrame` (column-level, lazy —
exceptions surface at ANALYSIS time per stage, not per row; per-row
isolation is an anti-pattern the engine deliberately drops: a transform
either compiles against the schema or the stage is skipped+logged).
"""

from __future__ import annotations

import importlib
import logging
from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

Transform = Callable[[DataFrame], DataFrame]

# namespace guard (reference constrains parsers to its own package,
# process.py:56-63)
ALLOWED_PREFIXES = ("gamechanger_data_spark.",)


def resolve_transform(spec: str) -> Transform:
    """Resolve 'package.module::func' to a callable, namespace-guarded."""
    mod_name, sep, fn_name = spec.partition("::")
    if not sep:
        raise ValueError(f"transform spec {spec!r} must be 'module::func'")
    if not mod_name.startswith(ALLOWED_PREFIXES):
        raise ValueError(
            f"transform module {mod_name!r} outside allowed namespaces {ALLOWED_PREFIXES}"
        )
    fn = getattr(importlib.import_module(mod_name), fn_name)
    if not callable(fn):
        raise TypeError(f"{spec} is not callable")
    return fn


def chain(df: DataFrame, transforms: list[Transform | str],
          isolate_errors: bool = False) -> DataFrame:
    """Compose transforms in order via DataFrame.transform.

    ``isolate_errors=True`` reproduces the reference's per-stage exception
    isolation (parse.py:71-76): a stage whose ANALYSIS fails is skipped and
    logged, the rest of the pipeline continues. Default is fail-fast.
    """
    def apply(acc: DataFrame, t: Transform | str) -> DataFrame:
        fn = resolve_transform(t) if isinstance(t, str) else t
        if not isolate_errors:
            return acc.transform(fn)
        try:
            out = acc.transform(fn)
            out.schema  # force analysis now so errors attach to this stage
            return out
        except Exception:  # noqa: BLE001 - mirrored isolation semantics
            log.exception("pipeline stage %r failed; skipping", t)
            return acc

    return reduce(apply, transforms, df)
