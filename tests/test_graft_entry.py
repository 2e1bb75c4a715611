"""Driver-contract test: ``__graft_entry__.entry()`` must return a jittable
forward step plus example args that trace and lower cleanly (the driver
compile-checks exactly this on a single chip).  Lowering only — no device
execution — so the test stays cheap on the CPU suite."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import __graft_entry__  # noqa: E402


def test_entry_traces_and_lowers():
    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)
    # flagship ZINC net: one scalar prediction per graph in the batch
    out_aval = jax.eval_shape(fn, *args)
    leaves = jax.tree_util.tree_leaves(out_aval)
    assert leaves, "entry() forward returned no outputs"
    assert all(l.shape[0] > 0 for l in leaves)
    assert lowered.as_text().startswith('module')


def test_entry_args_are_concrete():
    fn, args = __graft_entry__.entry()
    for leaf in jax.tree_util.tree_leaves(args):
        assert not isinstance(leaf, jax.core.Tracer)
