from mfrec_tpu.data.ratings import Ratings, Vocab
from mfrec_tpu.data.movielens import load_ratings_file, synthetic_ratings

__all__ = ['Ratings', 'Vocab', 'load_ratings_file', 'synthetic_ratings']
