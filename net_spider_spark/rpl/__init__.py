"""RPL (RFC 6550) domain layer: Contiki-NG log parsing, DIO/DAO models,
graph combination, and DODAG analytics.

Parity targets: ``net-spider-rpl/`` and ``net-spider-rpl-cli/`` — the
reference's production domain layer for low-power mesh network
monitoring, re-expressed as Spark pipelines over the generic findings
model.
"""
