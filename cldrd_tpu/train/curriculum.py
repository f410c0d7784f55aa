"""Curriculum driver: the 3-iteration CL-DRD pipeline as one program.

Replaces the reference's bash-orchestrated hand-off (SURVEY §3.5: run
``nway_listwise_1.py`` -> pass its checkpoint path to ``nway_listwise_2.py``
-> to ``nway_listwise_3.py`` -> index -> retrieve -> evaluate) with a single
config-driven loop. The weight hand-off is in-memory (the final params of
iteration k seed iteration k+1) — no checkpoint round-trip, no ``module.``
prefix juggling — though every iteration still writes resumable checkpoints.

An optional ``after_iteration`` hook receives (iteration index, final state,
trainer) — the natural place to run index-build + retrieval + MRR evaluation
per iteration (the missing ``continue_rerank_evaluator`` capability,
SURVEY §2.4).
"""
from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional, Sequence

from jax.sharding import Mesh

from cldrd_tpu.models import DistilBertConfig

from .config import TrainConfig
from .trainer import Trainer, TrainState

logger = logging.getLogger("cldrd_tpu.train")

DatasetFactory = Callable[[TrainConfig], Any]
IterationHook = Callable[[int, TrainState, Trainer], None]


def run_curriculum(
    iterations: Sequence[TrainConfig],
    model_config: DistilBertConfig,
    dataset_factory: DatasetFactory,
    init_params: Optional[Any] = None,
    mesh: Optional[Mesh] = None,
    after_iteration: Optional[IterationHook] = None,
) -> TrainState:
    """Train all curriculum iterations, handing weights forward.

    ``dataset_factory(cfg)`` builds the iteration's ``NwayDataset`` (each
    iteration reads a different teacher file / label mode). ``init_params``
    seeds iteration 1 (TAS-B weights for the paper's recipe); subsequent
    iterations always start from the previous iteration's final params.
    """
    assert len(iterations) >= 1
    state: Optional[TrainState] = None
    params = init_params
    for i, cfg in enumerate(iterations):
        logger.info(
            "=== curriculum iteration %d/%d (label_mode %s, lr %g, %d epochs) ===",
            i + 1, len(iterations), cfg.label_mode, cfg.learning_rate,
            cfg.num_train_epochs,
        )
        trainer = Trainer(cfg, model_config, mesh=mesh)
        dataset = dataset_factory(cfg)
        state = trainer.train(dataset, init_params=params)
        params = state.params
        if after_iteration is not None:
            after_iteration(i, state, trainer)
    assert state is not None
    return state
