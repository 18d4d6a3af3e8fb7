"""Temp-view hygiene for the SQL-constructed operators.

Several operators build their plan with ONE ``spark.sql`` parse over temp
views (~1/30th the py4j cost of the equivalent Column-API chain — measured
in operators/signal_pipeline). Registering those views under FIXED names
was the r6 ADVICE #3 hazard: two concurrent callers on one SparkSession can
rebind a name between registration and ``spark.sql`` (planning against the
wrong DataFrame), and the names permanently pollute the session catalog.

:func:`sql_over_views` closes both: each call registers its inputs under
uuid-suffixed names, formats them into the SQL, and drops them immediately
after ``spark.sql`` returns — safe because ``spark.sql`` analyzes EAGERLY
(Dataset construction runs the analyzer), so the returned DataFrame's
resolved plan no longer references the catalog entries.

Views are GLOBAL temp views (the ``global_temp`` database), not session
ones, because the inputs can belong to DIFFERENT sessions: inside
``foreachBatch`` the batch DataFrame lives in the stream's cloned session
while a dim table built outside lives in the main one, and a session view
registered by the dim's own session is invisible to the clone running the
SQL. (The old fixed-name code only appeared to work there because the
clone had copied an identically-named STALE view at clone time — the
silent-wrong-DataFrame hazard in person.) The global temp view manager is
application-wide, so every session resolves the same registration; the
uuid suffix + immediate drop keep it transient.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def sql_over_views(sql, **views: DataFrame) -> DataFrame:
    """Run SQL over the given DataFrames, each registered as a per-call
    unique temp view and dropped before returning.

    ``sql`` is a callable receiving ``{alias: registered_view_name}`` and
    returning the SQL string (a callable, not a str.format template,
    because the generated SQL legitimately contains braces). Example::

        sql_over_views(lambda v: f"SELECT * FROM {v['sig']}", sig=signals)
    """
    if not views:
        raise ValueError("sql_over_views needs at least one named DataFrame")
    spark = next(iter(views.values())).sparkSession
    raw: list[str] = []
    names: dict[str, str] = {}
    try:
        for alias, df in views.items():
            name = f"_v_{alias}_{uuid.uuid4().hex[:12]}"
            df.createOrReplaceGlobalTempView(name)
            raw.append(name)
            names[alias] = f"global_temp.{name}"
        return spark.sql(sql(names))
    finally:
        for name in raw:
            spark.catalog.dropGlobalTempView(name)
