"""Train the REFERENCE TGAT (imported from /root/reference, torch CPU) on a
synthetic dataset produced by our generator, mirroring its train loop.
Used to calibrate expected AP for our end-to-end tests. Not part of the
package; the reference is an oracle, never vendored."""
import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import numpy as np
import torch
import torch.nn as nn

from dyglib_tpu.data import write_synthetic_dataset, get_link_prediction_data
from models.TGAT import TGAT
from models.modules import MergeLayer
from utils.utils import NeighborSampler, NegativeEdgeSampler, get_neighbor_sampler
from utils.DataLoader import Data

root = "/tmp/refbase"
write_synthetic_dataset(root, "s", num_src=120, num_dst=60, num_edges=2000,
                        node_feat_scale=1.0, seed=7)
d = get_link_prediction_data("s", data_root=root)

def to_ref(stream):
    return Data(stream.src, stream.dst, stream.ts, stream.eid, stream.label)

train_data, full_data = to_ref(d.train), to_ref(d.full)
train_sampler = get_neighbor_sampler(train_data, "recent", seed=0)
full_sampler = get_neighbor_sampler(full_data, "recent", seed=1)
train_neg = NegativeEdgeSampler(train_data.src_node_ids, train_data.dst_node_ids)
val_neg = NegativeEdgeSampler(full_data.src_node_ids, full_data.dst_node_ids, seed=0)

torch.manual_seed(0); np.random.seed(0)
backbone = TGAT(d.node_raw_features.astype(np.float32), d.edge_raw_features.astype(np.float32),
                train_sampler, time_feat_dim=100, num_layers=2, num_heads=2, dropout=0.1)
head = MergeLayer(172, 172, 172, 1)
model = nn.Sequential(backbone, head)
opt = torch.optim.Adam(model.parameters(), lr=1e-3)
bce = nn.BCELoss()

from dyglib_tpu.train.metrics import average_precision, roc_auc

B, K = 200, 10
def run_eval(stream, sampler_graph, neg):
    model.eval(); backbone.set_neighbor_sampler(sampler_graph)
    neg.reset_random_state()
    aps, aucs = [], []
    with torch.no_grad():
        for s in range(0, len(stream.src), B):
            e = min(s + B, len(stream.src))
            src, dst, ts = stream.src[s:e], stream.dst[s:e], stream.ts[s:e]
            nsrc, ndst = neg.sample(e - s)
            se, de = backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts, num_neighbors=K)
            nse, nde = backbone.compute_src_dst_node_temporal_embeddings(nsrc, ndst, ts, num_neighbors=K)
            pp = head(se, de).squeeze(-1).sigmoid().numpy()
            np_ = head(nse, nde).squeeze(-1).sigmoid().numpy()
            pred = np.r_[pp, np_]; lab = np.r_[np.ones(e-s), np.zeros(e-s)]
            aps.append(average_precision(lab, pred)); aucs.append(roc_auc(lab, pred))
    return float(np.mean(aps)), float(np.mean(aucs))

for epoch in range(8):
    model.train(); backbone.set_neighbor_sampler(train_sampler)
    t0 = time.time(); losses = []
    for s in range(0, len(train_data.src_node_ids), B):
        e = min(s + B, len(train_data.src_node_ids))
        src, dst, ts = train_data.src_node_ids[s:e], train_data.dst_node_ids[s:e], train_data.node_interact_times[s:e]
        _, ndst = train_neg.sample(e - s)
        se, de = backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts, num_neighbors=K)
        nse, nde = backbone.compute_src_dst_node_temporal_embeddings(src, ndst, ts, num_neighbors=K)
        pp = head(se, de).squeeze(-1).sigmoid()
        np_p = head(nse, nde).squeeze(-1).sigmoid()
        pred = torch.cat([pp, np_p]); lab = torch.cat([torch.ones_like(pp), torch.zeros_like(np_p)])
        loss = bce(pred, lab)
        opt.zero_grad(); loss.backward(); opt.step()
        losses.append(loss.item())
    ap, auc = run_eval(d.val, full_sampler, val_neg)
    print(f"epoch {epoch+1}: loss {np.mean(losses):.4f} val ap {ap:.4f} auc {auc:.4f} ({time.time()-t0:.1f}s)")
