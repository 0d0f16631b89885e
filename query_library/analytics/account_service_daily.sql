-- Account / Service Daily Detail
-- Description: Daily cost and usage per account and service with resource and region detail (map-column access)
-- Output: top 20 (account, day, usage type, resource, region) rows by cost

SELECT
  bill_payer_account_id,
  line_item_usage_account_id,
  line_item_usage_start_date::date AS usage_day,
  line_item_usage_type,
  line_item_resource_id,
  product['region'] AS region,
  line_item_product_code,
  SUM(line_item_usage_amount) AS usage_amount,
  SUM(line_item_unblended_cost) AS unblended_cost
FROM CUR
WHERE line_item_line_item_type IN ('Usage', 'DiscountedUsage', 'SavingsPlanCoveredUsage')
GROUP BY 1, 2, 3, 4, 5, 6, 7
ORDER BY unblended_cost DESC
LIMIT 20
