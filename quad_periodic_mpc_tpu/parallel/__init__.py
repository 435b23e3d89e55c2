"""Device-mesh sharding and sweep runners (the rebuild's scaling layer:
batch axis = MPC instance, sharded over ICI/DCN — SURVEY.md section 2.4)."""
