"""MetricLogger CSV semantics: append, header-union rewrite, resume trim.

ADVICE r2: a resumed run whose first row had different columns (val_every
interplay) silently truncated the whole prior history; and duplicate
epoch rows from replayed epochs skewed summaries.  These tests pin the
fixed behaviour.
"""
import csv
import os

from pcd_reg_hregnet_tpu.utils.logging import MetricLogger


def read_rows(path):
    with open(path, newline='') as f:
        return list(csv.DictReader(f))


class TestMetricLoggerCsv:
    def test_plain_append_same_header(self, tmp_path):
        d = str(tmp_path)
        lg = MetricLogger(d, use_wandb=False)
        lg.log_epoch(0, {'loss': 1.0}, {'rre': 2.0})
        lg.close()
        lg = MetricLogger(d, use_wandb=False)
        lg.log_epoch(1, {'loss': 0.5}, {'rre': 1.0})
        lg.close()
        rows = read_rows(os.path.join(d, 'metrics.csv'))
        assert [r['epoch'] for r in rows] == ['0', '1']

    def test_header_mismatch_preserves_history_under_union(self, tmp_path):
        d = str(tmp_path)
        lg = MetricLogger(d, use_wandb=False)
        lg.log_epoch(0, {'loss': 1.0}, {})            # no val columns
        lg.close()
        lg = MetricLogger(d, use_wandb=False)
        lg.log_epoch(1, {'loss': 0.5}, {'rre': 1.0})  # val columns appear
        lg.close()
        rows = read_rows(os.path.join(d, 'metrics.csv'))
        assert [r['epoch'] for r in rows] == ['0', '1']     # history kept
        assert rows[0]['val/rre'] == '' and rows[1]['val/rre'] == '1.0'

    def test_resume_trim_drops_replayed_epochs(self, tmp_path):
        d = str(tmp_path)
        lg = MetricLogger(d, use_wandb=False)
        for e in range(4):
            lg.log_epoch(e, {'loss': 1.0 / (e + 1)}, {'rre': float(e)})
        lg.close()
        # preemption resume at epoch 2: rows 2..3 are replayed
        lg = MetricLogger(d, use_wandb=False, trim_from_epoch=2)
        lg.log_epoch(2, {'loss': 9.0}, {'rre': 9.0})
        lg.close()
        rows = read_rows(os.path.join(d, 'metrics.csv'))
        assert [r['epoch'] for r in rows] == ['0', '1', '2']
        assert rows[2]['val/rre'] == '9.0'                  # fresh row wins
