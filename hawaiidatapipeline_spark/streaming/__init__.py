"""Structured Streaming runtime (SURVEY.md §2.I, M5).

Every stateful operator here is the streaming wrapper of a batch twin in
``queries/events.py``; on a closed input the micro-batch output must equal
the batch result (enforced by tests/test_streaming.py). The reference had
no streaming — its analog was re-polling timestamped datasets; this package
is the [NS] extension built on watermarks + state stores.
"""
