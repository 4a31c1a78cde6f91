"""RPL DAO typed layer.

Parity target: ``net-spider-rpl/src/NetSpider/RPL/DAO.hs``:

* ``DAONode.dao_route_num`` (Maybe — absent for non-root nodes in
  non-storing mode) and ``DAOLink.path_lifetime_sec`` are plain map
  attributes here (DAO.hs:50-118); the Contiki parser emits exactly
  those keys (``rpl/contiki.py``).
* ``daoUnifierConf`` (DAO.hs:139-140): the DEFAULT standard unifier
  (latest sample per physical link) with negation disabled — DAO
  routes live in routing tables with their own lifetime, so a newer
  observation by the other endpoint does not negate a link.
* ``daoDefQuery`` (DAO.hs:130-136).

The default merge stays pure Catalyst (``max_by`` aggregate) — no
Python hook is needed because DAO links keep their ``fla`` attribute
shape through unification.
"""

from __future__ import annotations

from net_spider_spark.snapshot import Query
from net_spider_spark.unify import UnifyConfig, no_negation


def dao_unifier_conf() -> UnifyConfig:
    """``daoUnifierConf`` (DAO.hs:139-140): defUnifyStdConfig with
    ``negatesLinkSample = \\_ _ -> False``."""
    return UnifyConfig(negates=no_negation)


def dao_def_query(starts_from=None, **kwargs) -> Query:
    """``daoDefQuery`` (DAO.hs:130-136)."""
    return Query(starts_from=starts_from, unify=dao_unifier_conf(), **kwargs)
