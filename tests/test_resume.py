"""Kill-and-resume: training interrupted mid-run and resumed from the
'latest' checkpoint reproduces the uninterrupted loss curve and final params
exactly (the reference cannot resume at all —
multitask_benchmark/util/train.py:207-218)."""

import numpy as np
import pytest

import jax

from pna_tpu.data.molecules import ZincDataset
from pna_tpu.data.multitask import build_multitask_dataset
from pna_tpu.nn.nets import PNANetMolecules
from pna_tpu.train.realworld import PipelineConfig, RealworldTrainer

AGGS = ('mean', 'max', 'min', 'std')
SCAL = ('identity', 'amplification', 'attenuation')


def _make_trainer(tmp_path, resume, epochs):
    ds = ZincDataset.synthetic(n_train=64, n_val=16, n_test=16, seed=0)
    model = PNANetMolecules(
        num_atom_type=ds.num_atom_type, num_bond_type=ds.num_bond_type,
        hidden_dim=16, out_dim=16, n_layers=2, aggregators=AGGS, scalers=SCAL,
        avg_d=ds.avg_d(), readout_type='sum', towers=2,
        divide_input_first=False, divide_input_last=True, graph_norm=True,
        batch_norm=True, residual=True, edge_feat=False)
    cfg = PipelineConfig(epochs=epochs, batch_size=32, init_lr=5e-3,
                         lr_schedule_patience=20, metric='mae',
                         checkpoint_dir=str(tmp_path), resume=resume)
    trainer = RealworldTrainer(
        model, PNANetMolecules.loss, cfg,
        forward_args=lambda g: (g, g.node_feats.squeeze(-1), None),
        metric='mae')
    return trainer, ds


def test_realworld_kill_and_resume(tmp_path):
    # uninterrupted 4-epoch run
    tr_full, ds = _make_trainer(tmp_path / 'full', resume=False, epochs=4)
    _, _, hist_full = tr_full.fit(ds, log_fn=lambda s: None)

    # interrupted: 2 epochs, then a FRESH trainer resumes to epoch 4
    tr_a, ds_a = _make_trainer(tmp_path / 'ab', resume=False, epochs=2)
    tr_a.fit(ds_a, log_fn=lambda s: None)
    tr_b, ds_b = _make_trainer(tmp_path / 'ab', resume=True, epochs=4)
    state_b, best_b, hist_b = tr_b.fit(ds_b, log_fn=lambda s: None)

    assert [h['epoch'] for h in hist_b] == [2, 3]
    for h in hist_b:
        ref = hist_full[h['epoch']]
        np.testing.assert_allclose(h['train_loss'], ref['train_loss'],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(h['val_metric'], ref['val_metric'],
                                   rtol=1e-5, atol=1e-7)


def test_multitask_kill_and_resume(tmp_path):
    from pna_tpu.nn.dense import PNALayerDense
    from pna_tpu.nn.gnn import GNN
    from pna_tpu.ops.scalers import avg_d_from_dense_adj
    from pna_tpu.train.engine import MultitaskTrainer, TrainConfig

    data = build_multitask_dataset(
        out_path=None, seed=3,
        n_graphs={'train': [24] * 2, 'val': [12] * 2, 'default': [12] * 2},
        sizes={'train': [15, 18], 'val': [16, 19], 'test': [15, 18]},
        verbose=False)
    avg_d = avg_d_from_dense_adj(data['adj']['train'])
    conv = dict(layer_type=PNALayerDense,
                args=dict(aggregators=('mean', 'max'), scalers=('identity',),
                          avg_d=avg_d, towers=1, self_loop=False,
                          divide_input=False))

    def make(ck, resume, epochs):
        model = GNN(nhid=8, nodes_out=data['node_labels']['train'][0].shape[-1],
                    graph_out=data['graph_labels']['train'][0].shape[-1],
                    dropout=0.0, conv_layers=2, fc_layers=2,
                    final_activation='LeakyReLu', skip=False, gru=False,
                    fixed=False, variable=False, first_conv=conv,
                    middle_conv=conv)
        cfg = TrainConfig(lr=5e-3, epochs=epochs, patience=100,
                          print_every=1000, checkpoint_dir=str(ck),
                          resume=resume, checkpoint_every=2)
        return MultitaskTrainer(model, data, cfg)

    full = make(tmp_path / 'full', False, 4)
    s_full = full.fit(log_fn=lambda s: None)
    r_full = full.test(s_full, log_fn=lambda s: None)

    make(tmp_path / 'ab', False, 2).fit(log_fn=lambda s: None)
    resumed = make(tmp_path / 'ab', True, 4)
    s_res = resumed.fit(log_fn=lambda s: None)
    r_res = resumed.test(s_res, log_fn=lambda s: None)

    np.testing.assert_allclose(s_res['best_val'], s_full['best_val'],
                               rtol=1e-5)
    assert s_res['best_epoch'] == s_full['best_epoch']
    for dset in r_full:
        np.testing.assert_allclose(r_res[dset]['total'],
                                   r_full[dset]['total'], rtol=1e-5)
