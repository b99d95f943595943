"""Transform / UDF pipeline surface (reference §2.9).

The reference's ``@muller.compute`` decorates ``fn(sample_in, sample_out,
*args)`` into a ``ComputeFunction`` executed over worker slices with
direct chunk writes (``muller/core/transform/transform.py:70``,
``pipeline.py:258,898``).  Spark-first, a transform is a
``mapInPandas`` stage: Arrow batches in, Arrow batches out, the cluster
is the compute provider, and "checkpoint_interval" becomes a commit per
``eval`` call on the output dataset.

Supported shapes (as in the reference):
- 1-in-1-out: ``sample_out`` gets exactly one row appended per input
- 1-in-N-out / filtering: append 0..N rows (UDTF / flatMap semantics,
  reference ``pipeline.py`` skip_ok path)
- ``Pipeline`` = composition of ComputeFunctions

``fn`` receives ``sample_in`` as a plain dict and ``sample_out`` as a
``SampleOut`` accumulator with ``.append(dict)`` (and attribute-style
``sample_out.tensor.append(v)`` like the reference API).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class SampleOut:
    """Accumulator passed to compute functions."""

    def __init__(self) -> None:
        object.__setattr__(self, "rows", [])
        object.__setattr__(self, "_current", None)

    def append(self, row: dict) -> None:
        self.rows.append(dict(row))

    def __getattr__(self, tensor: str):
        if tensor.startswith("_"):
            raise AttributeError(tensor)
        return _TensorAppender(self, tensor)

    def __setattr__(self, tensor: str, value: Any) -> None:
        # `sample_out.y = v` assignment style: sets field y on the
        # CURRENT output row, with Python assignment semantics — a
        # second `sample_out.y = v2` OVERWRITES the field (unlike
        # `.append`, whose repeat flushes a row: append is the explicit
        # multi-row API).  Without this hook the assignment would
        # silently bind a plain instance attribute and the value would
        # never reach the output — a data-loss footgun.  Reserved names
        # ('rows' and '_'-prefixed) are REJECTED rather than silently
        # bound for the same reason: `sample_out.rows = v` is a
        # plausible user field name, and losing it silently is exactly
        # the bug this hook exists to prevent (internal writes go
        # through object.__setattr__ directly).
        if tensor.startswith("_") or tensor == "rows":
            raise ValueError(
                f"{tensor!r} is a reserved SampleOut name; output fields "
                f"may not be named 'rows' or start with '_' — rename the "
                f"output tensor (e.g. 'row_data')"
            )
        elif self._current is None:
            object.__setattr__(self, "_current", {tensor: value})
        else:
            self._current[tensor] = value


class _TensorAppender:
    def __init__(self, out: SampleOut, tensor: str) -> None:
        self._out = out
        self._tensor = tensor

    def append(self, value: Any) -> None:
        # attribute-style appends build up the current row; a row is
        # flushed when the same tensor is appended again
        cur = self._out._current
        if cur is None or self._tensor in cur:
            if cur is not None:
                self._out.rows.append(cur)
            object.__setattr__(self._out, "_current", {self._tensor: value})
        else:
            cur[self._tensor] = value


class ComputeFunction:
    def __init__(self, fn: Callable, args: tuple = (), kwargs: dict | None = None):
        self.fn = fn
        self.args = args
        self.kwargs = kwargs or {}

    def __call__(self, *args: Any, **kwargs: Any) -> "ComputeFunction":
        return ComputeFunction(self.fn, args, kwargs)

    # -- execution -------------------------------------------------------
    def apply(
        self,
        df: DataFrame,
        output_schema: T.StructType | str,
        ignore_errors: bool = False,
    ) -> DataFrame:
        """Run the transform over a DataFrame → DataFrame (Arrow-batched).

        ``ignore_errors=True`` (reference ``eval`` flag,
        ``transform.py:86-120`` / ``pipeline.py`` skip_ok path) drops
        rows whose transform raises instead of failing the job — the
        right default for corpus-scale ETL where a handful of malformed
        records must not kill a multi-hour run.  Failures are dropped
        silently row-by-row (the executor log carries nothing); callers
        needing accounting should count input vs output rows."""
        fn, args, kwargs = self.fn, self.args, self.kwargs

        def run(iterator):
            import pandas as pd

            for pdf in iterator:
                out_rows: list[dict] = []
                for rec in pdf.to_dict("records"):
                    sample_out = SampleOut()
                    try:
                        fn(rec, sample_out, *args, **kwargs)
                    except Exception:
                        if ignore_errors:
                            continue  # drop this row's (partial) output
                        raise
                    if sample_out._current is not None:
                        sample_out.rows.append(sample_out._current)
                    out_rows.extend(sample_out.rows)
                if out_rows:
                    yield pd.DataFrame(out_rows)

        return df.mapInPandas(run, output_schema)

    def eval(
        self,
        data_in,
        ds_out=None,
        output_schema: T.StructType | str | None = None,
        message: str = "transform eval",
        checkpoint_interval: "int | None" = None,
        ignore_errors: bool = False,
        **_: Any,
    ):
        """Reference-shaped entry: run over a Dataset/DataFrame, append
        results to ``ds_out`` (committing, like checkpointed eval) or
        return the transformed DataFrame.

        ``checkpoint_interval=N`` (Dataset input + ``ds_out`` only)
        reproduces the reference's auto-commit checkpoints
        (``core/transform/pipeline.py:149`` + the resumability contract
        of ``tests/stress/test_process_interrupt.py``): the input is
        processed in ``_row_id`` slices of N rows, each slice committed
        to ``ds_out`` with a ``[ckpt i/k]`` marker, and a RE-RUN of the
        same eval skips every slice whose marker commit already exists
        — an interrupted 100 TB transform resumes from the last
        checkpoint instead of restarting (and never double-appends).
        The commit log IS the checkpoint journal: no side state, and an
        interruption between append and commit loses only the
        in-memory staging, never a half-slice.  The transform fn must
        be deterministic for resume to be exact."""
        from muller_spark.dataset import Dataset

        if checkpoint_interval is not None:
            if not isinstance(data_in, Dataset) or ds_out is None:
                raise ValueError(
                    "checkpoint_interval needs a Dataset input (stable "
                    "_row_id slices) and a ds_out to journal commits into"
                )
            return self._eval_checkpointed(
                data_in, ds_out, output_schema, message, checkpoint_interval,
                ignore_errors=ignore_errors,
            )
        df = data_in.df if isinstance(data_in, Dataset) else data_in
        if output_schema is None and ds_out is not None:
            from muller_spark.schema import HIDDEN_COLS, spark_type_for

            fields = [
                T.StructField(
                    name, spark_type_for(m.get("htype", "generic"), m.get("dtype")), True
                )
                for name, m in ds_out.tensor_meta.items()
                if not m.get("hidden") and name not in HIDDEN_COLS
            ]
            output_schema = T.StructType(fields)
        if output_schema is None:
            raise ValueError("output_schema required when ds_out is None")
        from muller_spark.schema import HIDDEN_COLS as _HC

        out = self.apply(df.drop(*[c for c in _HC if c in df.columns]), output_schema,
                         ignore_errors=ignore_errors)
        if ds_out is not None:
            ds_out.extend_df(out)
            ds_out.commit(message)
            return ds_out
        return out


    def _eval_checkpointed(
        self, data_in, ds_out, output_schema, message: str, interval: int,
        ignore_errors: bool = False,
    ):
        from pyspark.sql import functions as F

        from muller_spark.schema import HIDDEN_COLS, ROW_ID_COL, spark_type_for

        if interval <= 0:
            raise ValueError("checkpoint_interval must be positive")
        if output_schema is None:
            fields = [
                T.StructField(
                    name,
                    spark_type_for(m.get("htype", "generic"), m.get("dtype")),
                    True,
                )
                for name, m in ds_out.tensor_meta.items()
                if not m.get("hidden") and name not in HIDDEN_COLS
            ]
            output_schema = T.StructType(fields)
        n = len(data_in)
        slices = [(lo, min(lo + interval, n)) for lo in range(0, n, interval)]
        k = len(slices)
        # the resume key carries the TRANSFORM IDENTITY (fn qualname +
        # bound args/kwargs) and the slicing (interval), not just the
        # message: without the qualname, a DIFFERENT transform evaled
        # into the same ds_out under the same message would find every
        # marker present and silently skip all work; without the
        # args/kwargs digest, the SAME fn re-evaled with different
        # parameters would likewise skip everything and produce no
        # output (round-7 ADVICE); and a re-run with a changed interval
        # would match no marker and double-append committed slices.
        # repr() of the bound arguments is stable for the plain
        # scalars/strings transforms are parameterized with; unreprable
        # exotic args degrade to their type name, which still separates
        # runs at the granularity we can observe.  Default object reprs
        # embed a MEMORY ADDRESS (`<Cfg object at 0x7f...>`) that
        # changes every process — hashing it would make a crashed eval
        # unresumable (new ident -> 'DIFFERENT eval' error steering the
        # user into double-appending), so addresses are normalized out;
        # identity granularity for such args degrades to their type,
        # matching the unreprable fallback.
        import hashlib as _hashlib
        import re as _re

        try:
            bound = repr((self.args, sorted(self.kwargs.items())))
        except Exception:
            bound = repr(
                ([type(a).__name__ for a in self.args],
                 sorted((k, type(v).__name__) for k, v in self.kwargs.items()))
            )
        bound = _re.sub(r" at 0x[0-9a-fA-F]+", " at 0x", bound)
        ident = _hashlib.md5(
            f"{getattr(self.fn, '__module__', '?')}."
            f"{getattr(self.fn, '__qualname__', repr(self.fn))}"
            f":{interval}:{bound}".encode()
        ).hexdigest()[:8]
        suffix = f"/{k} {ident}]"
        done = set()
        for snap in ds_out.log_history():
            msg = getattr(snap, "message", "") or ""
            if not msg.startswith(message + " [ckpt "):
                continue
            if msg.endswith(suffix):
                try:
                    done.add(int(msg.split("[ckpt ", 1)[1].split("/", 1)[0]))
                except ValueError:
                    pass
            else:
                raise ValueError(
                    f"ds_out already holds checkpoints for a DIFFERENT "
                    f"eval under message {message!r} ({msg!r}); resuming "
                    f"would mix journals — use a distinct message"
                )
        src = data_in.df
        for i, (lo, hi) in enumerate(slices, start=1):
            if i in done:
                continue
            part = src.filter(
                (F.col(ROW_ID_COL) >= lo) & (F.col(ROW_ID_COL) < hi)
            ).drop(*[c for c in HIDDEN_COLS if c in src.columns])
            ds_out.extend_df(self.apply(part, output_schema, ignore_errors=ignore_errors))
            ds_out.commit(f"{message} [ckpt {i}/{k} {ident}]")
        return ds_out


def compute(fn: Callable) -> ComputeFunction:
    """``@muller.compute`` equivalent (reference ``api/transform.py:11``)."""
    return functools.wraps(fn)(ComputeFunction(fn))


class Pipeline:
    """Chain of ComputeFunctions (reference ``core/transform/__init__.py``)."""

    def __init__(self, functions: Sequence[ComputeFunction]):
        self.functions = list(functions)

    def apply(self, df: DataFrame, schemas: Sequence[T.StructType | str]) -> DataFrame:
        if len(schemas) != len(self.functions):
            raise ValueError("one output schema per pipeline stage")
        out = df
        for fn, schema in zip(self.functions, schemas):
            out = fn.apply(out, schema)
        return out


def composite(functions: Sequence[ComputeFunction]) -> Pipeline:
    return Pipeline(functions)
