"""Planning layer: dotted-path navigation, Mongo-query evaluation with BSON
cross-type ordering, Catalyst→Mongo filter translation, and partition
planning (splitters).  This is the part of the reference that Catalyst does
NOT provide (SURVEY §4): everything relational above it is Spark's job.
"""
