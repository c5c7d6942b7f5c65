from dd_graphdb_spark.plans.gql import parse_gql
from dd_graphdb_spark.plans.lower import GQLEngine

__all__ = ["parse_gql", "GQLEngine"]
