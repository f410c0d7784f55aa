"""Command-line entrypoints.

Replaces the reference's orchestration layer — bash scripts invoking
per-script argparse mains (``scripts/*.sh``, ``scripts/unity/*.sh``,
``trainer/multistep-curriculum/nway_listwise_{1,2,3}.py:99-165``,
``retriever/index_text.py:30-55``, ``retriever/retrieve_top_passages.py``,
``evaluation/retrieval_evaluator.py:249-259``) — with one module per verb:

  python -m cldrd_tpu.cli.train       --config cfg.yaml [overrides]
  python -m cldrd_tpu.cli.curriculum  --config cfg.yaml --training-paths a b c
  python -m cldrd_tpu.cli.index       --checkpoint ck --collection c.tsv --out idx/
  python -m cldrd_tpu.cli.retrieve    --index idx/ --queries q.tsv --run out.tsv
  python -m cldrd_tpu.cli.retrieve_queries  (passage -> top queries, data creation)
  python -m cldrd_tpu.cli.evaluate    --qrels qrels.tsv --run out.tsv
"""
