-- EC2 Purchase-Option Mix
-- Description: Monthly EC2 cost split by purchase option (On-Demand / Spot / Reserved / Savings Plan), with effective (amortized) cost where the commitment columns carry it
-- Partitioning: billing_period
-- Output: one row per (billing_period, purchase_option)

SELECT
  billing_period,
  CASE
    WHEN line_item_line_item_type = 'SavingsPlanCoveredUsage' THEN 'Savings Plan'
    WHEN line_item_line_item_type = 'DiscountedUsage' THEN 'Reserved'
    WHEN line_item_usage_type LIKE '%SpotUsage%' THEN 'Spot'
    ELSE 'On-Demand'
  END AS purchase_option,
  SUM(line_item_usage_amount) AS usage_amount,
  SUM(line_item_unblended_cost) AS unblended_cost,
  SUM(CASE
    WHEN line_item_line_item_type = 'SavingsPlanCoveredUsage'
      THEN savings_plan_savings_plan_effective_cost
    WHEN line_item_line_item_type = 'DiscountedUsage'
      THEN reservation_effective_cost
    ELSE line_item_unblended_cost
  END) AS effective_cost
FROM CUR
WHERE line_item_product_code = 'AmazonEC2'
  AND line_item_line_item_type IN ('Usage', 'DiscountedUsage', 'SavingsPlanCoveredUsage')
GROUP BY 1, 2
ORDER BY 1, effective_cost DESC
