'''
Item-item similarity graph export.

Re-design of reference ``mfrec/graph/similarity_graph.py:5-42``: the edge
set comes from the blocked all-pairs top-k similarity kernel (one device
call) instead of a per-node python query loop; output is networkx +
GraphML, same as the reference.
'''
from __future__ import annotations

import numpy as np

MAX_NBR_RELATED = 50


class SimilarityGraph(object):
    '''Generate a similarity graph using a recommender.'''

    def __init__(self, recommender, nodes_attributes=None):
        import networkx as nx
        self.recommender = recommender
        self.similarity_graph = nx.Graph()
        self.nodes_attributes = nodes_attributes

    def set_recommender(self, recommender):
        self.recommender = recommender

    def add_node(self, n):
        if not self.similarity_graph.has_node(n):
            self.similarity_graph.add_node(n)
            if self.nodes_attributes:
                for key, value in self.nodes_attributes.items():
                    self.similarity_graph.nodes[n][key] = value[n]

    def add_edge(self, n1, n2, weight=None):
        if not self.similarity_graph.has_edge(n1, n2):
            self.similarity_graph.add_edge(n1, n2, weight=weight)
        else:
            self.similarity_graph[n1][n2]['weight'] += weight

    def build_graph(self, min_score=0.98, max_related=MAX_NBR_RELATED,
                    verbose=False):
        '''Batched: one all-pairs top-k call, then edge filtering
        (reference build_graph, similarity_graph.py:32-39).'''
        import jax.numpy as jnp
        from mfrec_tpu.ops import similarity as sim_ops
        rec = self.recommender
        F = jnp.asarray(np.asarray(rec.Q, np.float32))
        k = min(max_related, F.shape[0] - 1)
        idx, sims = sim_ops.all_pairs_topk(F, k, method='cosine')
        idx, sims = np.asarray(idx), np.asarray(sims)
        for item_index, title in enumerate(rec.items.labels):
            self.add_node(title)
            for j in range(k):
                score = float(sims[item_index, j])
                if score <= min_score:
                    continue
                other = rec.items.labels[int(idx[item_index, j])]
                self.add_edge(title, other, score)
                if verbose:
                    print('%s --%s--> %s' % (title, score, other))

    def write_graph(self, name='similarity_graph.graphml'):
        import networkx as nx
        nx.write_graphml(self.similarity_graph, name)


def ratings_bipartite_graph(recommender):
    '''Bipartite user-item ratings graph (the store-agnostic replacement
    for the reference's neo4j exports, base.py:619-681): User and Item
    nodes, `rating` edges weighted by value.  Export with
    ``networkx.write_graphml``.'''
    import networkx as nx
    g = nx.Graph()
    for label in recommender.users.labels:
        g.add_node('u:' + label, type='User', label=label)
    for label in recommender.items.labels:
        g.add_node('i:' + label, type='Item', label=label)
    for u, i, v in recommender.ratings_iterator():
        g.add_edge('u:' + recommender.users.labels[u],
                   'i:' + recommender.items.labels[i], value=float(v))
    return g
