"""Ray Data stages: stateless batch transforms (plain functions → tasks) and
stateful actor-pool stages (callable classes — models/tries built once per
actor in __init__, applied per Arrow batch in __call__)."""
