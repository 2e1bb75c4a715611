"""CLI smoke tests: multitask generate+train and the realworld mains run end
to end with tiny settings."""

import json
import os
import sys

import numpy as np
import pytest


def test_generate_and_train_pna(tmp_path, monkeypatch, capsys):
    from pna_tpu.cli import generate_dataset, pna
    out = str(tmp_path / 'ds.pkl')
    monkeypatch.setattr(sys, 'argv', [
        'gen', '--out', out, '--seed', '5'])
    # shrink the dataset spec for the test
    from pna_tpu.data import multitask
    monkeypatch.setattr(multitask, 'DEFAULT_N_GRAPHS',
                        {'train': [16, 16], 'val': [8], 'default': [8]})
    monkeypatch.setattr(
        multitask, 'default_sizes',
        lambda extrapolation=False: {'train': [8, 9], 'val': [8],
                                     'test': [8]})
    generate_dataset.main()
    assert os.path.exists(out)

    monkeypatch.setattr(sys, 'argv', [
        'pna', '--data', out, '--epochs', '2', '--patience', '5',
        '--conv_layers', '2', '--hidden', '8', '--towers', '2',
        '--aggregators', 'mean max', '--scalers', 'identity',
        '--fc_layers', '2', '--print_every', '1'])
    pna.main()
    assert 'Test set results' in capsys.readouterr().out


def test_main_molecules_synthetic(monkeypatch):
    from pna_tpu.cli import main_molecules
    best = main_molecules.main([
        '--synthetic', '--epochs', '2', '--batch_size', '32',
        '--hidden_dim', '20', '--out_dim', '20', '--L', '2', '--towers', '2'])
    assert np.isfinite(best['test_metric'])


def test_main_hiv_synthetic():
    from pna_tpu.cli import main_HIV
    best = main_HIV.main(['--synthetic', '--epochs', '2', '--batch_size', '32',
                          '--hidden_dim', '16', '--out_dim', '16', '--L', '2'])
    assert np.isfinite(best['test_metric'])


def test_main_superpixels_synthetic():
    from pna_tpu.cli import main_superpixels
    best = main_superpixels.main([
        '--synthetic', '--epochs', '2', '--batch_size', '32',
        '--hidden_dim', '16', '--out_dim', '16', '--L', '2', '--towers', '2'])
    assert np.isfinite(best['test_metric'])


def test_pyg_example_synthetic(capsys):
    """The PyG end-to-end example trainer (reference
    models/pytorch_geometric/example.py) runs on the synthetic fallback:
    degree-histogram avg_deg, PNAConvSimple stack, per-epoch ROC-AUC,
    plateau schedule."""
    from pna_tpu.cli import pyg_example
    best = pyg_example.main(['--synthetic', '--epochs', '2',
                             '--batch_size', '256'])
    assert 0.0 <= best[0] <= 1.0 and best[2] >= 1
