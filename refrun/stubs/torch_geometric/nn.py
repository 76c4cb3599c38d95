import math

import torch
from torch import nn


def gcn_norm(edge_index, edge_weight, num_nodes, add_self_loops=True,
             fill_value=1.0):
    """PyG gcn_norm: optional self-loops, symmetric normalization.

    edge_index: LongTensor [2, E] (row=source, col=target).
    Returns (edge_index, norm_weight).
    """
    if edge_weight is None:
        edge_weight = torch.ones(edge_index.size(1),
                                 dtype=torch.float32,
                                 device=edge_index.device)
    if add_self_loops:
        # PyG add_remaining_self_loops: existing self-loop edges are
        # DROPPED, then every node gets one loop with fill_value — the
        # final self-loop weight is exactly 1.0 regardless of the input
        mask = edge_index[0] != edge_index[1]
        edge_index = edge_index[:, mask]
        edge_weight = edge_weight[mask]
        loop = torch.arange(num_nodes, device=edge_index.device)
        edge_index = torch.cat(
            [edge_index, torch.stack([loop, loop])], dim=1)
        edge_weight = torch.cat(
            [edge_weight,
             torch.full((num_nodes,), fill_value,
                        dtype=edge_weight.dtype,
                        device=edge_weight.device)])
    row, col = edge_index[0], edge_index[1]
    deg = torch.zeros(num_nodes, dtype=edge_weight.dtype,
                      device=edge_weight.device)
    deg.scatter_add_(0, col, edge_weight)
    deg_inv_sqrt = deg.pow(-0.5)
    deg_inv_sqrt[deg_inv_sqrt == float("inf")] = 0.0
    return edge_index, deg_inv_sqrt[row] * edge_weight * deg_inv_sqrt[col]


class GCNConv(nn.Module):
    """x' = D^-1/2 (A+I) D^-1/2 x W + b — PyG GCNConv defaults
    (normalize=True, add_self_loops=True, improved=False, bias=True)."""

    def __init__(self, in_channels, out_channels, bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.weight = nn.Parameter(torch.empty(in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        self.reset_parameters()

    def reset_parameters(self):
        # PyG glorot: uniform(-a, a), a = sqrt(6 / (fan_in + fan_out))
        a = math.sqrt(6.0 / (self.in_channels + self.out_channels))
        nn.init.uniform_(self.weight, -a, a)
        if self.bias is not None:
            nn.init.zeros_(self.bias)

    def forward(self, x, edge_index, edge_weight=None):
        num_nodes = x.size(0)
        edge_index, norm = gcn_norm(edge_index, edge_weight, num_nodes)
        x = x @ self.weight
        out = torch.zeros_like(x)
        # aggregate messages from source (row) into target (col)
        out.index_add_(0, edge_index[1], norm.unsqueeze(-1) * x[edge_index[0]])
        if self.bias is not None:
            out = out + self.bias
        return out
