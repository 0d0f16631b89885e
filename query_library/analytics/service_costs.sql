-- Service Cost Overview
-- Description: Monthly cost per service with resource counts
-- Partitioning: billing_period
-- Output: one row per (billing_period, service)

SELECT
  billing_period,
  product_servicecode AS service,
  SUM(line_item_unblended_cost) AS total_cost,
  COUNT(DISTINCT line_item_resource_id) AS resource_count,
  COUNT(*) AS line_items
FROM CUR
WHERE line_item_unblended_cost > 0
GROUP BY 1, 2
ORDER BY 1, total_cost DESC
