import networkx as nx
import torch


class Data:
    """Minimal PyG Data: edge_index plus arbitrary attrs, .to(device)."""

    def __init__(self, edge_index=None, x=None):
        self.edge_index = edge_index
        self.x = x

    def to(self, device):
        if self.edge_index is not None:
            self.edge_index = self.edge_index.to(device)
        if self.x is not None:
            self.x = self.x.to(device)
        return self


def from_networkx(G):
    """Node order = G.nodes() insertion order; undirected edges are
    emitted in both directions (self-loops once), matching PyG."""
    mapping = {n: i for i, n in enumerate(G.nodes())}
    H = G.to_directed() if not nx.is_directed(G) else G
    edges = [(mapping[u], mapping[v]) for u, v in H.edges()]
    if edges:
        edge_index = torch.tensor(edges, dtype=torch.long).t().contiguous()
    else:
        edge_index = torch.zeros((2, 0), dtype=torch.long)
    return Data(edge_index=edge_index)
