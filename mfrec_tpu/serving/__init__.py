from mfrec_tpu.serving.server import RecommenderServer, serve

__all__ = ['RecommenderServer', 'serve']
