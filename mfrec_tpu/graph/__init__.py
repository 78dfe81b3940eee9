from mfrec_tpu.graph.similarity_graph import SimilarityGraph

__all__ = ['SimilarityGraph']
