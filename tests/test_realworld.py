"""Real-world pipeline integration tests on synthetic datasets: the full
train_val_pipeline must learn (beat a trivial predictor) in a few epochs."""

import numpy as np
import pytest

from pna_tpu.data.hiv import HIVDataset
from pna_tpu.data.molecules import ZincDataset
from pna_tpu.data.superpixels import SuperpixelsDataset
from pna_tpu.nn.nets import PNANetHIV, PNANetMolecules, PNANetSuperpixels
from pna_tpu.train.realworld import PipelineConfig, RealworldTrainer

AGGS = ('mean', 'max', 'min', 'std')
SCAL = ('identity', 'amplification', 'attenuation')


def test_zinc_pipeline_learns():
    ds = ZincDataset.synthetic(n_train=128, n_val=32, n_test=32, seed=0)
    avg_d = ds.avg_d()
    model = PNANetMolecules(
        num_atom_type=ds.num_atom_type, num_bond_type=ds.num_bond_type,
        hidden_dim=16, out_dim=16, n_layers=2, aggregators=AGGS, scalers=SCAL,
        avg_d=avg_d, readout_type='sum', towers=2, divide_input_first=False,
        divide_input_last=True, graph_norm=True, batch_norm=True,
        residual=True, edge_feat=True, edge_dim=8)
    cfg = PipelineConfig(epochs=14, batch_size=32, init_lr=5e-3,
                         lr_schedule_patience=20, metric='mae')
    trainer = RealworldTrainer(
        model, PNANetMolecules.loss, cfg,
        forward_args=lambda g: (g, g.node_feats.squeeze(-1),
                                g.edge_feats.squeeze(-1)),
        metric='mae')
    state, best, history = trainer.fit(ds, log_fn=lambda s: None)
    labels = np.array([r['label'] for r in ds.test])
    trivial = np.mean(np.abs(labels - labels.mean()))
    assert best['test_metric'] < trivial, \
        f"MAE {best['test_metric']} vs trivial {trivial}"


def test_hiv_pipeline_learns():
    ds = HIVDataset.synthetic(n_train=128, n_val=48, n_test=48, seed=0)
    avg_d = ds.avg_d()
    model = PNANetHIV(hidden_dim=16, out_dim=16, n_layers=2,
                      aggregators=AGGS, scalers=SCAL, avg_d=avg_d,
                      readout_type='mean', dropout=0.0, batch_norm=True,
                      residual=True)
    cfg = PipelineConfig(epochs=8, batch_size=32, init_lr=5e-3,
                         lr_schedule_patience=20, metric='roc_auc')
    trainer = RealworldTrainer(model, PNANetHIV.loss, cfg,
                               forward_args=lambda g: (g, g.node_feats),
                               metric='roc_auc')
    state, best, history = trainer.fit(ds, log_fn=lambda s: None,
                                       select_best='max')
    assert best['test_metric'] > 0.6, f"ROC {best['test_metric']}"


def test_superpixels_pipeline_learns():
    ds = SuperpixelsDataset.synthetic(n_train=128, n_val=32, n_test=32,
                                      seed=0, n_sp=15)
    avg_d = ds.avg_d()
    in_dim = ds.train[0]['node_feats'].shape[-1]
    model = PNANetSuperpixels(
        in_dim=in_dim, in_dim_edge=1, hidden_dim=16, out_dim=16,
        n_classes=ds.n_classes, n_layers=2, aggregators=AGGS, scalers=SCAL,
        avg_d=avg_d, readout_type='sum', towers=2, divide_input_first=True,
        divide_input_last=False, graph_norm=True, batch_norm=True,
        residual=True, edge_feat=True, edge_dim=8)
    cfg = PipelineConfig(epochs=10, batch_size=32, init_lr=5e-3,
                         lr_schedule_patience=20, metric='accuracy')
    trainer = RealworldTrainer(
        model, PNANetSuperpixels.loss, cfg,
        forward_args=lambda g: (g, g.node_feats, g.edge_feats),
        metric='accuracy')
    state, best, history = trainer.fit(ds, log_fn=lambda s: None,
                                       select_best='max')
    assert best['test_metric'] > 0.2, f"acc {best['test_metric']} (chance 0.1)"
