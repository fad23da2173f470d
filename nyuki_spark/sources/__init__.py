"""Sources & sinks beyond the built-in file formats.

:mod:`bus` — the reference's message-bus surface (subscribe/publish JSON
events on topics) as a Spark 4 Python DataSource, with a file-backed
transport that doubles as the test harness. On a real deployment the same
pipeline code points at Kafka (`format("kafka")`) — the bus abstraction is
deliberately shaped so only the format string changes.
"""
