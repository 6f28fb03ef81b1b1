from graphtap_tpu.ingest.io import read_edge_list, apply_transforms, write_binary
from graphtap_tpu.ingest.graph import Graph
from graphtap_tpu.ingest.rmat import rmat_edges

__all__ = ["read_edge_list", "apply_transforms", "write_binary", "Graph", "rmat_edges"]
