"""Reference DyGFormer training-step throughput (torch CPU) at the
wikipedia operating point (max_seq 32, patch 1, B=200)."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")
import numpy as np, torch, torch.nn as nn

from dyglib_tpu.data import write_synthetic_dataset, get_link_prediction_data
from models.DyGFormer import DyGFormer
from models.modules import MergeLayer
from utils.utils import NegativeEdgeSampler, get_neighbor_sampler
from utils.DataLoader import Data

root = "/tmp/refthr2"
write_synthetic_dataset(root, "wiki", num_src=8227, num_dst=1000, num_edges=157474, seed=1)
d = get_link_prediction_data("wiki", data_root=root)
train = Data(d.train.src, d.train.dst, d.train.ts, d.train.eid, d.train.label)
sampler = get_neighbor_sampler(train, "recent", seed=0)
neg = NegativeEdgeSampler(train.src_node_ids, train.dst_node_ids)

torch.manual_seed(0); torch.set_num_threads(8)
backbone = DyGFormer(d.node_raw_features.astype(np.float32), d.edge_raw_features.astype(np.float32),
                     sampler, time_feat_dim=100, channel_embedding_dim=50, patch_size=1,
                     num_layers=2, num_heads=2, dropout=0.1, max_input_sequence_length=32)
head = MergeLayer(172, 172, 172, 1)
model = nn.Sequential(backbone, head)
opt = torch.optim.Adam(model.parameters(), lr=1e-4)
bce = nn.BCELoss()

B = 200
model.train()
times = []
for i in range(3 + 15):
    s = (i * B) % (len(train.src_node_ids) - B)
    src, dst, ts = train.src_node_ids[s:s+B], train.dst_node_ids[s:s+B], train.node_interact_times[s:s+B]
    _, ndst = neg.sample(B)
    t0 = time.time()
    se, de = backbone.compute_src_dst_node_temporal_embeddings(src, dst, ts)
    nse, nde = backbone.compute_src_dst_node_temporal_embeddings(src, ndst, ts)
    pp = head(se, de).squeeze(-1).sigmoid()
    npb = head(nse, nde).squeeze(-1).sigmoid()
    loss = bce(torch.cat([pp, npb]), torch.cat([torch.ones_like(pp), torch.zeros_like(npb)]))
    opt.zero_grad(); loss.backward(); opt.step()
    if i >= 3:
        times.append(time.time() - t0)
dt = np.mean(times)
print(f"reference DyGFormer train step: {dt*1e3:.1f} ms -> {B/dt:.1f} edges/s (B={B}, maxlen=32, patch=1, torch CPU)")
