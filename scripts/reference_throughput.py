"""Measure the REFERENCE TGAT training-step throughput (torch CPU, its only
supported backend in this environment) at Wikipedia scale. One-off: the
number is recorded in bench.py as the vs_baseline denominator."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import numpy as np, torch, torch.nn as nn

from dyglib_tpu.data import write_synthetic_dataset, get_link_prediction_data
from models.TGAT import TGAT
from models.modules import MergeLayer
from utils.utils import NegativeEdgeSampler, get_neighbor_sampler
from utils.DataLoader import Data

root = "/tmp/refthr"
write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000, num_edges=157474, seed=1)
d = get_link_prediction_data("wiki", data_root=root)
train = Data(d.train.src, d.train.dst, d.train.ts, d.train.eid, d.train.label)
sampler = get_neighbor_sampler(train, "recent", seed=0)
neg = NegativeEdgeSampler(train.src_node_ids, train.dst_node_ids)

torch.manual_seed(0)
torch.set_num_threads(8)
backbone = TGAT(d.node_raw_features.astype(np.float32), d.edge_raw_features.astype(np.float32),
                sampler, time_feat_dim=100, num_layers=2, num_heads=2, dropout=0.1)
head = MergeLayer(172, 172, 172, 1)
model = nn.Sequential(backbone, head)
opt = torch.optim.Adam(model.parameters(), lr=1e-4)
bce = nn.BCELoss()

B, K = 200, 20
model.train()
n_warm, n_meas = 3, 15
times = []
for i in range(n_warm + n_meas):
    s = (i * B) % (len(train.src_node_ids) - B)
    src, dst, ts = train.src_node_ids[s:s+B], train.dst_node_ids[s:s+B], train.node_interact_times[s:s+B]
    _, ndst = neg.sample(B)
    t0 = time.time()
    se, de = backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts, num_neighbors=K)
    nse, nde = backbone.compute_src_dst_node_temporal_embeddings(src, ndst, ts, num_neighbors=K)
    pp = head(se, de).squeeze(-1).sigmoid()
    npb = head(nse, nde).squeeze(-1).sigmoid()
    loss = bce(torch.cat([pp, npb]), torch.cat([torch.ones_like(pp), torch.zeros_like(npb)]))
    opt.zero_grad(); loss.backward(); opt.step()
    if i >= n_warm:
        times.append(time.time() - t0)
dt = np.mean(times)
print(f"reference TGAT train step: {dt*1e3:.1f} ms/step -> {B/dt:.1f} edges/s (B={B}, K={K}, L=2, torch CPU {torch.get_num_threads()} threads)")
