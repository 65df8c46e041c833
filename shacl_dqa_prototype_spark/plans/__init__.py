"""Plans: the staged construction pipeline and the DQA constraint planner
(the Spark replacement for the reference's Jinja2 → pySHACL stack)."""
