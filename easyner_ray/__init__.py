"""easyner_ray — a Ray-Data-native knowledge-graph-construction engine.

A from-scratch rebuild of the information-extraction semantics of
callebalik/EasyNER (surveyed in SURVEY.md; reference at /root/reference,
studied read-only) as an idiomatic Ray Data pipeline over Parquet tables of
multi-turn conversation/agent transcripts:

    read_parquet(transcripts)
      -> sentence-split explode                  (stages.splitter)
      -> dictionary + model NER actor pools      (stages.dict_ner / model_ner)
      -> mention postprocess / conflict resolve  (functions.sepmerge / conflict)
      -> co-occurrence triple extraction         (stages.triples)
      -> entity linking                          (stages.nel)
      -> node canonicalization groupby           (stages.canonicalize)
      -> partitioned Parquet graph sink          (state.sink)

Everything is expressed over ``ray.data.Dataset`` with
``map_batches(batch_format="pyarrow")``; stateful stages are callable-class
actor pools. No module here calls ``ray.init()`` — sessions are owned by the
caller (bench.py, CLI, or the test fixture).
"""

__version__ = "0.1.0"
