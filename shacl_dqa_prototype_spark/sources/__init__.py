"""Sources and sinks: documents scan, N-Triples scan, triple sink
(subject-hash partitioned), report sinks, manifest table."""
