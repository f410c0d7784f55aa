"""Utils: meters, train-log TSV, profiling timers/throughput, NaN policy."""
import time

import numpy as np
import pytest

from cldrd_tpu.utils import (
    AverageMeter,
    MetricMonitor,
    PhaseTimer,
    Throughput,
    write_train_logs,
)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2 and m.val == 3.0
    m.reset()
    assert m.avg == 0.0 and m.count == 0


def test_metric_monitor_tsv():
    mon = MetricMonitor()
    mon.update(10, loss=1.5, mrr=0.3)
    mon.update(20, loss=1.2, mrr=0.4, extra=7.0)
    tsv = mon.to_tsv().splitlines()
    assert tsv[0] == "step\tloss\tmrr\textra"
    assert tsv[1].startswith("10\t1.500000\t0.300000\t")
    assert tsv[2].endswith("7.000000")


def test_write_train_logs_header_and_rows(tmp_path):
    path = str(tmp_path / "log.tsv")
    write_train_logs(1, 50, 0.5, 0.8, 0.9, 1e-5, filename=path)
    write_train_logs(1, 100, 0.4, 0.85, 0.95, 9e-6, filename=path,
                     reg_loss=0.01, total_aux_ratio=0.02)
    lines = open(path).read().splitlines()
    assert lines[0] == "epoch\tstep\tloss\tmrr@10\trecall@10\tlr"
    assert len(lines) == 3


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        time.sleep(0.02)
    with t.phase("a"):
        time.sleep(0.01)
    rep = t.report()
    assert set(rep) == {"a_s", "b_s", "total_s"}
    assert rep["a_s"] >= 0.02 and rep["b_s"] >= 0.02
    assert rep["total_s"] == pytest.approx(rep["a_s"] + rep["b_s"], abs=1e-3)
    assert t.to_tsv().splitlines()[0] == "a_s\tb_s\ttotal_s"


def test_throughput():
    tp = Throughput()
    tp.update(100)
    tp.update(50)
    time.sleep(0.01)
    rep = tp.report(unit="queries")
    assert rep["queries"] == 150
    assert rep["queries_per_s"] > 0


def test_nan_policy_raises():
    """A diverging configuration must fail fast under nan_policy='raise'."""
    import jax

    from cldrd_tpu.data.nway_dataset import NwayDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.models import DistilBertConfig
    from cldrd_tpu.parallel import make_mesh
    from cldrd_tpu.train import TrainConfig, Trainer

    # vocab-overflowing tokenizer: trainer's first-batch validation raises
    tok = HashTokenizer(30522)
    ds = NwayDataset(
        {0: "q"}, {0: "rel", 1: "n1", 2: "n2", 3: "n3", 4: "n4", 5: "n5"},
        [{"qid": 0, "relT_pids": [0], "neg_pids": [1, 2, 3, 4, 5]}] * 8,
        tok, 8, 8, "1",
    )
    cfg = TrainConfig(label_mode="1", batch_size=8, num_train_epochs=1,
                      learning_rate=1e-3, warmup_steps=1, logging_steps=100,
                      evaluate_steps=1000, max_query_len=8, max_passage_len=8,
                      compute_dtype="float32", run_folder="/tmp/nanpol",
                      experiment_name="x")
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
    with pytest.raises(ValueError, match="vocab_size"):
        trainer.train(ds)
