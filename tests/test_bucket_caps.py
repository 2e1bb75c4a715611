"""Dataset-stable bucket capacities: every batch of the iterator shares ONE
static shape (single compiled step for the whole run) and the bucketed
layout preserves the batch's semantics (VERDICT r2 item 7)."""

import numpy as np

from pna_tpu.data.molecules import (batch_iterator, derive_bucket_caps,
                                    synthetic_zinc)


def test_stable_caps_single_shape():
    records = synthetic_zinc(90, seed=3)
    B = 16
    caps = derive_bucket_caps(records, B)
    shapes = set()
    specs = set()
    total_graphs = 0
    for epoch_seed in range(3):
        for g, labels in batch_iterator(records, B, epoch_seed,
                                        shuffle=True, bucket_caps=caps):
            shapes.add((g.node_feats.shape, g.senders.shape,
                        labels.shape))
            specs.add(g.bucket_spec)
            assert g.in_deg is not None
            # per-graph node counts survive the node permutation
            ngi = np.asarray(g.node_graph_ids)
            nm = np.asarray(g.node_mask)
            total_graphs += int(np.asarray(g.graph_mask).sum())
            # real nodes carry in-range graph ids (filler graphs of short
            # batches keep real nodes but are masked in graph_mask, so the
            # map is node->valid id, not node->unmasked graph) ...
            gm = np.asarray(g.graph_mask)
            assert (ngi[nm] >= 0).all() and (ngi[nm] < gm.shape[0]).all()
            # ... and every unmasked graph owns at least one real node
            assert np.isin(np.flatnonzero(gm), ngi[nm]).all()
    assert len(shapes) == 1, shapes
    assert len(specs) == 1
    # 90 records / 16 per batch -> 6 batches/epoch, last padded+masked to 10
    assert total_graphs == 3 * 90


def test_short_final_batch_filled_from_head():
    ds = type('D', (), {'train': synthetic_zinc(17, seed=0)})
    B = 16
    caps = derive_bucket_caps(ds.train, B)
    batches = list(batch_iterator(ds.train, B, 0, shuffle=False,
                                  bucket_caps=caps))
    assert len(batches) == 2
    g, labels = batches[1]
    gm = np.asarray(g.graph_mask)
    assert gm.sum() == 1           # only the single real graph unmasked
    assert labels.shape == batches[0][1].shape


def test_caps_cover_worst_batch():
    """The bound must hold for the degenerate 1-real-graph batch filled
    with head records (the case chunk-repetition used to miss)."""
    ds = type('D', (), {'train': synthetic_zinc(33, seed=1)})
    B = 32
    caps = derive_bucket_caps(ds.train, B)
    # last batch = record 32 + records 0..30 as filler; must not raise
    for g, _ in batch_iterator(ds.train, B, 0, shuffle=False,
                               bucket_caps=caps):
        pass
