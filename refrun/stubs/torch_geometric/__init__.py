"""Faithful minimal torch_geometric stub (GCNConv + from_networkx) so the
UNMODIFIED reference code can run on CPU without the real PyG wheel.

Semantics mirror torch_geometric 2.x defaults as used by the reference
(models/modeling_rag.py:29,53: ``GCNConv(in, out)`` called as
``conv(x, edge_index, edge_weight=None)``; utils/model.py:13,197:
``from_networkx``):

- gcn_norm with add_self_loops=True, improved=False (fill value 1.0),
  symmetric D^-1/2 (A+I) D^-1/2 normalization, flow source_to_target.
- Linear(in, out, bias=False) with glorot (Xavier-uniform) weight init +
  separate zero-init bias parameter, exactly PyG's GCNConv reset.
- from_networkx: node order = G.nodes() insertion order; undirected
  graphs are expanded to both edge directions (self-loops once).
"""
