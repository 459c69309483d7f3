"""J1 — overlap subtraction (SURVEY §2.4): the reference's
``substract_overlapping_geometries`` (``gdf_standardization.py:1055-1115``)
as a distributed operator.

Shape: the subtraction *spec* names a handful of target/subtractor rows by
key; the table can be arbitrarily large. The subtractor geometries are
collected once (a semi-join by key — small by construction) and broadcast;
each partition then folds ``difference`` over its own target rows — no
shuffle of the table, O(spec) driver work.

Semantics preserved (SURVEY §2.12.1):
* tuple form ``(target_value, [subtractor_values])`` — element 0 is a
  scalar key (``:1104-1107``);
* dict form ``{target: [subtractors]}`` accumulates per-target errors and
  PRINTS them instead of raising (``:1091-1103``);
* wrong tuple arity → ``ValueError`` (``:1108-1110``);
* per target: subtract each subtractor IN SPEC ORDER, only when it
  ``intersects`` (``:963-966``); ``buffer(0)``-style bowtie repair on
  invalid targets first (``:791-804``);
* ``inplace=False`` re-standardizes every geometry (constructor semantics,
  ``:1115``) with ``remove_geni`` defaulting True.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom import (
    parse_wkt,
    to_wkt,
    difference,
    intersects,
    repair_bowtie,
    standardize_geometry,
)

__all__ = ["subtract_overlapping"]


def subtract_overlapping(
    df: DataFrame,
    column_name: str,
    args,
    *,
    wkt_col: str = "geometry_wkt",
    remove_geni: bool = True,
    restandardize: bool = True,
) -> DataFrame:
    """Subtract subtractor geometries from target geometries by key.

    ``args``: ``(target_value, [subtractor_values])`` or
    ``{target_value: [subtractor_values], ...}``.
    """
    if df.schema[column_name] is None:  # raises if missing — parity with
        pass  # _validate_column_name
    if isinstance(args, dict):
        spec = {k: list(v) for k, v in args.items()}
        dict_form = True
    elif isinstance(args, tuple) and len(args) == 2:
        target_value, subs = args
        spec = {target_value: list(subs)}
        dict_form = False
    else:
        raise ValueError(
            "Invalid args format. Must be a tuple (target_value, "
            "values_to_substract) or a dictionary."
        )

    # collect subtractor geometries (small: only keys named in the spec)
    all_sub_keys = sorted({v for subs in spec.values() for v in subs})
    sub_rows = (
        df.filter(F.col(column_name).isin(all_sub_keys))
        .select(column_name, wkt_col)
        .collect()
    )
    sub_geoms: dict = {}
    for r in sub_rows:
        sub_geoms.setdefault(r[column_name], []).append(r[wkt_col])

    errors: list[str] = []
    plan: dict = {}
    for target_value, subs in spec.items():
        missing = [v for v in subs if v not in sub_geoms]
        if missing:
            msg = (
                f"Error processing {target_value} with {subs}: no geometries "
                f"found for {missing}"
            )
            if dict_form:
                errors.append(msg)
                continue
            raise ValueError(msg)
        plan[target_value] = [w for v in subs for w in sub_geoms[v]]
    if errors:
        print(f"Encountered {len(errors)} errors during processing:")
        for e in errors:
            print(f"  - {e}")

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(plan)
    do_std = restandardize
    rg = remove_geni

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = bc.value
        for pdf in batches:
            out = pdf.copy()
            wkts = out[wkt_col].tolist()
            keys = out[column_name].tolist()
            for i, (k, w) in enumerate(zip(keys, wkts)):
                g = None
                if k in local:
                    g = repair_bowtie(parse_wkt(w))
                    for sub_wkt in local[k]:
                        sub = parse_wkt(sub_wkt)
                        if intersects(g, sub):
                            g = difference(g, sub)
                if do_std:
                    g = standardize_geometry(
                        g if g is not None else parse_wkt(w), remove_geni=rg
                    )
                if g is not None:
                    wkts[i] = to_wkt(g)
            out[wkt_col] = wkts
            yield out

    return df.mapInPandas(run, schema=df.schema)
