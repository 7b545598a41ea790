"""Full-model MemoryModel (TGN/DyRep/JODIE) parity vs the PyTorch reference.

The strongest memory-model check: weights are transplanted into the live
torch reference (MemoryModel.py:10-698), the reference's neighbor sampler
is injected with FIXED tables, and TWO positive commit cycles are driven
through both implementations. Asserted per step:

  * src/dst output embeddings (incl. DyRep's updated-memory swap,
    MemoryModel.py:163-166, and JODIE's per-role time projection,
    MemoryModel.py:111-124);
  * stored raw-message CONTENTS and times after each commit — our
    keep-last slot vs the last entry of the reference's per-node message
    list (MemoryModel.py:287-291 keep-last aggregation);
  * committed memory + last_update arrays after step 2 (the step-1
    messages flow through the GRU/RNN cell there).

Batches contain duplicate src ids and src∩dst overlaps to exercise the
keep-last and dst-overwrites-src semantics (MemoryModel.py:148-161).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from dyglib_tpu.models import FeatureTables  # noqa: E402
from dyglib_tpu.models.memory_model import (  # noqa: E402
    MemoryModel,
    MemoryModelInputs,
    TimeShiftStats,
    segment_roles,
)

D = 172
TIME_DIM = 100
K = 4
B = 5
N_NODES = 40
N_EDGES = 100
SHIFTS = TimeShiftStats(
    src_mean=37.0, src_std=11.0, dst_mean=53.0, dst_std=7.0
)


class CallOrderSampler:
    sample_neighbor_strategy = "recent"
    seed = 0

    def __init__(self, tables):
        self.tables = list(tables)
        self.i = 0

    def get_historical_neighbors(self, node_ids, node_interact_times, num_neighbors):
        out = self.tables[self.i]
        self.i += 1
        return out


def _set_linear(tl, kernel, bias=None):
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(kernel).T.copy()))
        if bias is not None:
            tl.bias.copy_(torch.from_numpy(np.asarray(bias).copy()))


def _transplant(ref, p, model_name):
    with torch.no_grad():
        ref.time_encoder.w.weight.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["w"]).T.copy())
        )
        ref.time_encoder.w.bias.copy_(
            torch.from_numpy(np.asarray(p["time_encoder"]["b"]).copy())
        )
    cell = p["memory_cell"]
    upd = ref.memory_updater.memory_updater  # torch GRUCell / RNNCell
    with torch.no_grad():
        # FusedGRUCell / FusedRNNCell use torch's EXACT parameterization
        # (wi (D,[3]H), wh (H,[3]H), bi, bh — gate order [r|z|n]): the
        # transplant is a direct transpose, both bias vectors included
        w_ih = np.asarray(cell["wi"]).T
        w_hh = np.asarray(cell["wh"]).T
        b_ih = np.asarray(cell["bi"])
        b_hh = np.asarray(cell["bh"])
        upd.weight_ih.copy_(torch.from_numpy(w_ih.copy()))
        upd.weight_hh.copy_(torch.from_numpy(w_hh.copy()))
        upd.bias_ih.copy_(torch.from_numpy(b_ih.copy()))
        upd.bias_hh.copy_(torch.from_numpy(b_hh.copy()))

    if model_name == "JODIE":
        _set_linear(
            ref.embedding_module.linear_layer,
            p["time_projection"]["kernel"], p["time_projection"]["bias"],
        )
        return
    conv = ref.embedding_module.temporal_conv_layers[0]
    cp = p["temporal_conv_0"]
    _set_linear(conv.query_projection, cp["query_projection"]["kernel"])
    _set_linear(conv.key_projection, cp["key_projection"]["kernel"])
    _set_linear(conv.value_projection, cp["value_projection"]["kernel"])
    _set_linear(conv.residual_fc, cp["residual_fc"]["kernel"], cp["residual_fc"]["bias"])
    with torch.no_grad():
        conv.layer_norm.weight.copy_(
            torch.from_numpy(np.asarray(cp["layer_norm"]["scale"]).copy())
        )
        conv.layer_norm.bias.copy_(
            torch.from_numpy(np.asarray(cp["layer_norm"]["bias"]).copy())
        )
    mp = p["merge_0"]
    _set_linear(ref.embedding_module.merge_layers[0].fc1, mp["fc1"]["kernel"], mp["fc1"]["bias"])
    _set_linear(ref.embedding_module.merge_layers[0].fc2, mp["fc2"]["kernel"], mp["fc2"]["bias"])


def _mk_inputs(model_name, ids2, ts2, nbr, eid, nts):
    ids2 = jnp.asarray(ids2, jnp.int32)
    ts2 = jnp.asarray(ts2, jnp.int32)
    roles = segment_roles(len(ids2) // 2, ("src", "dst"))
    if model_name == "JODIE":
        return MemoryModelInputs(ids2, ts2, (ids2,), (), (ts2,), (), roles=roles)
    return MemoryModelInputs(
        ids4=ids2, ts4=ts2,
        hop_ids=(ids2, jnp.asarray(nbr, jnp.int32)),
        hop_eids=(jnp.asarray(eid, jnp.int32),),
        hop_ts=(ts2, jnp.asarray(nts, jnp.int32)),
        hop_mask=(jnp.asarray(nbr != 0),),
        roles=roles,
    )


@pytest.mark.parametrize("model_name", ["TGN", "DyRep", "JODIE"])
def test_memory_model_two_commit_cycles_parity(model_name):
    from models.MemoryModel import MemoryModel as RefMemoryModel

    rng = np.random.default_rng(13)
    node_feats = rng.normal(size=(N_NODES, D)).astype(np.float32)
    edge_feats = rng.normal(size=(N_EDGES, D)).astype(np.float32)
    node_feats[0] = 0.0
    edge_feats[0] = 0.0

    # batch 1: duplicate src (index 0 == index 1) and a src∩dst overlap
    src1 = np.array([3, 3, 7, 12, 20])
    dst1 = np.array([25, 30, 3, 33, 12])
    ts1 = np.array([100.0, 120.0, 140.0, 160.0, 180.0])
    eid1 = np.array([1, 2, 3, 4, 5])
    # batch 2 re-touches batch-1 nodes (3, 12, 25) so their stored messages
    # flow through the cell, plus fresh nodes
    src2 = np.array([3, 12, 25, 8, 9])
    dst2 = np.array([14, 3, 31, 25, 35])
    ts2 = np.array([300.0, 320.0, 340.0, 360.0, 380.0])
    eid2 = np.array([6, 7, 8, 9, 10])

    def mk_nbr(ids):
        m = len(ids)
        nbr = rng.integers(0, N_NODES, size=(m, K))
        eids = np.where(nbr == 0, 0, rng.integers(1, N_EDGES, size=(m, K)))
        nts = np.where(nbr == 0, 0.0, rng.integers(1, 90, size=(m, K))).astype(np.float64)
        return nbr, eids, nts

    nbr1, neid1, nts1 = mk_nbr(np.concatenate([src1, dst1]))
    nbr2, neid2, nts2 = mk_nbr(np.concatenate([src2, dst2]))

    # ---- ours
    m = MemoryModel(
        model_name=model_name, memory_dim=D, num_neighbors=K, num_layers=1,
        num_heads=2, dropout=0.1, time_feat_dim=TIME_DIM, time_shifts=SHIFTS,
    )
    tables = FeatureTables(node=jnp.asarray(node_feats), edge=jnp.asarray(edge_feats))
    state0 = m.init_state(tables)
    in1 = _mk_inputs(model_name, np.concatenate([src1, dst1]),
                     np.concatenate([ts1, ts1]), nbr1, neid1, nts1)
    params = m.module.init(jax.random.PRNGKey(0), tables, state0, in1)

    embs1, state1 = m.forward_and_maybe_commit(
        params, tables, state0, in1,
        jnp.asarray(src1, jnp.int32), jnp.asarray(dst1, jnp.int32),
        jnp.asarray(ts1, jnp.int32), jnp.asarray(eid1, jnp.int32),
        jnp.ones((B,), bool),
    )
    in2 = _mk_inputs(model_name, np.concatenate([src2, dst2]),
                     np.concatenate([ts2, ts2]), nbr2, neid2, nts2)
    embs2, state2 = m.forward_and_maybe_commit(
        params, tables, state1, in2,
        jnp.asarray(src2, jnp.int32), jnp.asarray(dst2, jnp.int32),
        jnp.asarray(ts2, jnp.int32), jnp.asarray(eid2, jnp.int32),
        jnp.ones((B,), bool),
    )

    # ---- reference
    sampler = CallOrderSampler([
        (nbr1, neid1, nts1), (nbr2, neid2, nts2)
    ])
    ref = RefMemoryModel(
        node_raw_features=node_feats, edge_raw_features=edge_feats,
        neighbor_sampler=sampler, time_feat_dim=TIME_DIM,
        model_name=model_name, num_layers=1, num_heads=2, dropout=0.1,
        src_node_mean_time_shift=SHIFTS.src_mean,
        src_node_std_time_shift=SHIFTS.src_std,
        dst_node_mean_time_shift_dst=SHIFTS.dst_mean,
        dst_node_std_time_shift=SHIFTS.dst_std,
    )
    _transplant(ref, params["params"], model_name)
    ref.eval()

    def check_messages(state, batch_nodes):
        """Our keep-last slot == last entry of the reference's list."""
        for nid in np.unique(batch_nodes):
            ref_msgs = ref.memory_bank.node_raw_messages[nid]
            assert len(ref_msgs) > 0, f"node {nid} has no reference messages"
            ref_msg, ref_t = ref_msgs[-1]
            np.testing.assert_allclose(
                np.asarray(state.msg[nid]), ref_msg.detach().numpy(),
                atol=5e-4,
                err_msg=f"message content mismatch at node {nid}",
            )
            assert int(state.msg_time[nid]) == int(ref_t)
            assert bool(state.msg_valid[nid])

    with torch.no_grad():
        r_src1, r_dst1 = ref.compute_src_dst_node_temporal_embeddings(
            src_node_ids=src1, dst_node_ids=dst1, node_interact_times=ts1,
            edge_ids=eid1, edges_are_positive=True, num_neighbors=K,
        )
    np.testing.assert_allclose(
        np.asarray(embs1[:B]), r_src1.numpy(), atol=5e-4,
        err_msg="step-1 src embeddings",
    )
    np.testing.assert_allclose(
        np.asarray(embs1[B:]), r_dst1.numpy(), atol=5e-4,
        err_msg="step-1 dst embeddings",
    )
    check_messages(state1, np.concatenate([src1, dst1]))

    with torch.no_grad():
        r_src2, r_dst2 = ref.compute_src_dst_node_temporal_embeddings(
            src_node_ids=src2, dst_node_ids=dst2, node_interact_times=ts2,
            edge_ids=eid2, edges_are_positive=True, num_neighbors=K,
        )
    np.testing.assert_allclose(
        np.asarray(embs2[:B]), r_src2.numpy(), atol=5e-4,
        err_msg="step-2 src embeddings (read step-1 messages)",
    )
    np.testing.assert_allclose(
        np.asarray(embs2[B:]), r_dst2.numpy(), atol=5e-4,
        err_msg="step-2 dst embeddings (read step-1 messages)",
    )
    check_messages(state2, np.concatenate([src2, dst2]))

    # committed memory and clocks after step 2 (cell applied to step-1
    # messages for re-touched nodes)
    ref_mem = ref.memory_bank.node_memories.detach().numpy()
    ref_lu = ref.memory_bank.node_last_updated_times.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(state2.memory[:N_NODES]), ref_mem, atol=5e-4,
        err_msg="committed memory after step 2",
    )
    np.testing.assert_array_equal(
        np.asarray(state2.last_update[:N_NODES]), ref_lu.astype(np.int64)
    )
