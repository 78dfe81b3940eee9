'''A mongomock-style in-memory fake of the pymongo 2.x surface the
reference binds (``pymongo.Connection`` era — ``base.py:16,599-794``):
attribute-access collections on a Database, ``Collection.insert`` of a
doc or list, ``Collection.update(spec, document)`` with ``$set`` /
whole-document replacement and ``upsert``/``multi`` flags,
``Collection.find(spec)`` returning an iterable cursor, ``find_one``,
``count``, ``remove``, and ``save``.  No network, no pymongo import —
behaviorally faithful enough that code written against it runs
unchanged against a real pymongo 2.x Database.
'''
from __future__ import annotations

import copy
import itertools


class FakeCursor:
    def __init__(self, docs):
        self._docs = docs

    def __iter__(self):
        return iter(copy.deepcopy(self._docs))

    def count(self):
        return len(self._docs)

    def sort(self, key, direction=1):
        self._docs = sorted(self._docs, key=lambda d: d.get(key),
                            reverse=direction < 0)
        return self

    def limit(self, n):
        self._docs = self._docs[:int(n)]
        return self


class FakeCollection:
    _ids = itertools.count(1)

    def __init__(self, name):
        self.name = name
        self._docs = []

    # -- pymongo 2.x write API -------------------------------------------
    def insert(self, doc_or_docs):
        docs = doc_or_docs if isinstance(doc_or_docs, list) \
            else [doc_or_docs]
        ids = []
        for d in docs:
            d = copy.deepcopy(d)
            d.setdefault('_id', next(self._ids))
            self._docs.append(d)
            ids.append(d['_id'])
        return ids if isinstance(doc_or_docs, list) else ids[0]

    insert_many = insert
    insert_one = insert

    def _matches(self, doc, spec):
        return all(doc.get(k) == v for k, v in (spec or {}).items())

    def update(self, spec, document, upsert=False, multi=False):
        n = 0
        for doc in self._docs:
            if self._matches(doc, spec):
                if any(k.startswith('$') for k in document):
                    for op, fields in document.items():
                        if op == '$set':
                            doc.update(copy.deepcopy(fields))
                        elif op == '$inc':
                            for k, v in fields.items():
                                doc[k] = doc.get(k, 0) + v
                        else:
                            raise NotImplementedError(op)
                else:            # whole-document replacement
                    _id = doc.get('_id')
                    doc.clear()
                    doc.update(copy.deepcopy(document))
                    doc['_id'] = _id
                n += 1
                if not multi:
                    break
        if n == 0 and upsert:
            base = dict(spec or {})
            if any(k.startswith('$') for k in document):
                for fields in (document.get('$set') or {},):
                    base.update(copy.deepcopy(fields))
            else:
                base = copy.deepcopy(document)
            self.insert(base)
            n = 1
        return {'n': n, 'updatedExisting': n > 0 and not upsert}

    def save(self, doc):
        if '_id' in doc:
            self.update({'_id': doc['_id']}, doc, upsert=True)
            return doc['_id']
        return self.insert(doc)

    def remove(self, spec=None):
        before = len(self._docs)
        self._docs = [d for d in self._docs
                      if not self._matches(d, spec or {})]
        return {'n': before - len(self._docs)}

    # -- read API ---------------------------------------------------------
    def find(self, spec=None):
        return FakeCursor([d for d in self._docs
                           if self._matches(d, spec or {})])

    def find_one(self, spec=None):
        for d in self._docs:
            if self._matches(d, spec or {}):
                return copy.deepcopy(d)
        return None

    def count(self):
        return len(self._docs)


class FakeDatabase:
    '''db.items / db['items'] lazily create collections, like pymongo.'''

    def __init__(self, name='test'):
        self._name = name
        self._collections = {}

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        return self._collections.setdefault(name, FakeCollection(name))

    __getitem__ = __getattr__

    def collection_names(self):
        return list(self._collections)


class FakeConnection:
    '''pymongo.Connection stand-in: conn.dbname / conn['dbname'].'''

    def __init__(self, host='localhost', port=27017):
        self._dbs = {}

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        return self._dbs.setdefault(name, FakeDatabase(name))

    __getitem__ = __getattr__
