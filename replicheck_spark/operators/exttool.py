"""External-tool-per-batch operator: pipe Arrow batches through ONE subprocess
each and parse its findings into a fixed schema.

The reference shells out to an external analyzer once per FILE BATCH, not per
row (/root/reference/replicheck/tools/Unused/Unused.py:42-46 writes a batch
then runs one flake8 over it; tools/bugNsafety/utils_python.py:20-25 same
shape). The Spark-native form is ``mapInPandas``: each Arrow batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) becomes one subprocess
invocation — process startup amortized ~10^4x vs per-row, and the operator
stays fully distributed (one concurrent subprocess per task, no driver
involvement).

Protocol (tool-agnostic, injectable for tests): the subprocess reads JSON
Lines on stdin — one object per input row containing the selected columns —
and writes JSON Lines on stdout — one object per FINDING, keys matching the
declared output schema. A nonzero exit raises with the tool's stderr. This is
the template for any classifier/scorer binary in a training-data pipeline
(quality model, PII scanner, license detector).
"""

from __future__ import annotations

import json
import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pipe_tool(
    df: DataFrame,
    cmd: list[str],
    input_cols: list[str],
    out_schema: T.StructType,
) -> DataFrame:
    """Run ``cmd`` once per Arrow batch over ``input_cols``, JSONL in/out.

    Findings need not be 1:1 with input rows (0..N findings per row). Column
    values must be JSON-serializable (strings/numbers); binary columns should
    be pre-encoded by the caller.
    """
    out_cols = [f.name for f in out_schema.fields]

    def jsonable(v):
        # Arrow->pandas null handling breaks the JSONL contract in two ways:
        # nulls arrive as NaN (json.dumps emits bare `NaN`, which is NOT
        # JSON — jq/serde/Go consumers reject the line) and any int column
        # containing a null is float-coerced (1 -> 1.0, mis-parsed by
        # integer-expecting tools). convert_dtypes() below restores nullable
        # Int64 columns; here NA/NaN become real nulls and numpy scalars
        # become plain Python numbers.
        import numpy as np

        import math

        if v is None or v is pd.NA:
            return None
        # NaN AND +/-inf -> null: json.dumps(allow_nan=False) would otherwise
        # raise ValueError on a single non-finite value and kill the task;
        # null is a line the tool can reject per-row instead.
        if isinstance(v, (float, np.floating)) and not math.isfinite(v):
            return None
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.bool_):
            return bool(v)
        return v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sub = pdf[input_cols].convert_dtypes()
            payload = "\n".join(
                json.dumps(
                    {k: jsonable(v) for k, v in rec.items()}, allow_nan=False
                )
                for rec in sub.to_dict(orient="records")
            )
            proc = subprocess.run(
                cmd, input=payload, capture_output=True, text=True
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"external tool {cmd[0]!r} exited "
                    f"{proc.returncode}: {proc.stderr[:2000]}"
                )
            recs = [
                json.loads(line)
                for line in proc.stdout.splitlines()
                if line.strip()
            ]
            yield pd.DataFrame(
                {c: [r.get(c) for r in recs] for c in out_cols}
            )

    return df.select(*input_cols).mapInPandas(run, schema=out_schema)
