"""apollon_spark — a PySpark-native feature-engineering engine.

A from-scratch re-creation of the query/data-processing capabilities of
the reference feature-extraction framework (ifsm/apollon) as distributed,
point-in-time-correct windowed operators over tables of pre-tokenized
sequences ``(doc_id string, tokens array<int>, n_tok int, source string)``.

Design (Spark-first, NOT a port):

- All relational work is declared through the DataFrame / SQL API so
  Catalyst handles pushdown, pruning, join selection, and AQE.
- Numeric kernels that Spark lacks (framed short-time analysis, rFFT
  batteries, HMM EM, SOM epochs) run as vectorized Arrow ``mapInPandas``
  / ``applyInPandas`` stages — never per-row Python.
- Per-doc work is embarrassingly parallel and executed WITHOUT a shuffle
  (``mapInPandas`` over the docs table); skewed long docs are split into
  halo-overlapped chunks so one whale parallelizes across tasks.
"""

__version__ = "0.1.0"
