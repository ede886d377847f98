"""Streaming control layer: the reference's event loop (SQS poller ->
dispatcher -> incubation -> culler) as Structured Streaming, plus the shared
pure transition function that the batch replay engine folds with.
"""
