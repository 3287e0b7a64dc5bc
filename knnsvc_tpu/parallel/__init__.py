from knnsvc_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from knnsvc_tpu.parallel.sharded_knn import sharded_knn_topk, shard_pool

__all__ = ["make_mesh", "data_sharding", "replicated", "sharded_knn_topk", "shard_pool"]
