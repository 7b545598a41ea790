"""Train the REFERENCE TGN (imported from /root/reference, torch CPU) on our
synthetic dataset with the same protocol as our memory-model tests —
end-metric calibration for the TGN family. Oracle only, never vendored."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import numpy as np, torch, torch.nn as nn

from dyglib_tpu.data import write_synthetic_dataset, get_link_prediction_data
from models.MemoryModel import MemoryModel, compute_src_dst_node_time_shifts
from models.modules import MergeLayer
from utils.utils import NegativeEdgeSampler, get_neighbor_sampler
from utils.DataLoader import Data

root = "/tmp/refbase_tgn"
write_synthetic_dataset(root, "s", num_src=120, num_dst=60, num_edges=2000,
                        node_feat_scale=1.0, seed=7)
d = get_link_prediction_data("s", data_root=root)

def to_ref(s):
    return Data(s.src, s.dst, s.ts, s.eid, s.label)

train_data, full_data = to_ref(d.train), to_ref(d.full)
train_sampler = get_neighbor_sampler(train_data, "recent", seed=0)
full_sampler = get_neighbor_sampler(full_data, "recent", seed=1)
train_neg = NegativeEdgeSampler(train_data.src_node_ids, train_data.dst_node_ids)
val_neg = NegativeEdgeSampler(full_data.src_node_ids, full_data.dst_node_ids, seed=0)

torch.manual_seed(0); np.random.seed(0)
sm, ss, dm, ds_ = compute_src_dst_node_time_shifts(
    train_data.src_node_ids, train_data.dst_node_ids, train_data.node_interact_times)
backbone = MemoryModel(d.node_raw_features.astype(np.float32), d.edge_raw_features.astype(np.float32),
                       train_sampler, time_feat_dim=100, model_name="TGN", num_layers=1,
                       num_heads=2, dropout=0.1, src_node_mean_time_shift=sm,
                       src_node_std_time_shift=ss, dst_node_mean_time_shift_dst=dm,
                       dst_node_std_time_shift=ds_)
head = MergeLayer(172, 172, 172, 1)
model = nn.Sequential(backbone, head)
opt = torch.optim.Adam(model.parameters(), lr=1e-3)
bce = nn.BCELoss()

from dyglib_tpu.train.metrics import average_precision, roc_auc
B, K = 200, 10

def eval_split(stream, neg):
    model.eval(); neg.reset_random_state()
    aps, aucs = [], []
    with torch.no_grad():
        for s in range(0, len(stream.src), B):
            e = min(s + B, len(stream.src))
            src, dst, ts, eid = stream.src[s:e], stream.dst[s:e], stream.ts[s:e], stream.eid[s:e]
            nsrc, ndst = neg.sample(e - s)
            nse, nde = backbone.compute_src_dst_node_temporal_embeddings(nsrc, ndst, ts, None, False, K)
            se, de = backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts, eid, True, K)
            pp = head(se, de).squeeze(-1).sigmoid().numpy()
            npb = head(nse, nde).squeeze(-1).sigmoid().numpy()
            pred = np.r_[pp, npb]; lab = np.r_[np.ones(e-s), np.zeros(e-s)]
            aps.append(average_precision(lab, pred)); aucs.append(roc_auc(lab, pred))
    return float(np.mean(aps)), float(np.mean(aucs))

for epoch in range(3):
    model.train()
    backbone.set_neighbor_sampler(train_sampler)
    backbone.memory_bank.__init_memory_bank__()
    t0 = time.time(); losses = []
    tr = d.train
    for s in range(0, len(tr.src), B):
        e = min(s + B, len(tr.src))
        src, dst, ts, eid = tr.src[s:e], tr.dst[s:e], tr.ts[s:e], tr.eid[s:e]
        _, ndst = train_neg.sample(e - s)
        nse, nde = backbone.compute_src_dst_node_temporal_embeddings(src, ndst, ts, None, False, K)
        se, de = backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts, eid, True, K)
        pp = head(se, de).squeeze(-1).sigmoid()
        npb = head(nse, nde).squeeze(-1).sigmoid()
        loss = bce(torch.cat([pp, npb]), torch.cat([torch.ones_like(pp), torch.zeros_like(npb)]))
        opt.zero_grad(); loss.backward(); opt.step()
        backbone.memory_bank.detach_memory_bank()
        losses.append(loss.item())
    backbone.set_neighbor_sampler(full_sampler)
    ap, auc = eval_split(d.val, val_neg)
    print(f"epoch {epoch+1}: loss {np.mean(losses):.4f} val ap {ap:.4f} auc {auc:.4f} ({time.time()-t0:.1f}s)")
